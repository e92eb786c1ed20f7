"""Training-data-op queries + DuckDB oracles for the driver contract.

Each Spark query is built from the DataFrame operators in
``functions/``; each oracle is an independently-written DuckDB SQL
program over the same parquet views. Deduplication queries run over a
deterministic duplicate fixture derived from ``documents`` (the driver
corpus has no native dups): exact copies for doc_id%7==0 (+100000) and
near-copies with an appended tail for doc_id%11==0 (+200000).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import dedup as dd
from .functions import sketch as sk
from .functions import multimodal as mm
from .functions import prep as pp
from .functions import reduce_dim as rd
from .functions import rerank as rr
from .functions import similarity as sim
from .functions import textstats as ts

NEAR_TAIL = " near duplicate tail marker tokens"

# deterministic PII tail seeded onto doc_id%5==0 rows for the scrub
# query (the driver corpus is plain word salad — without seeding the
# redaction counts would all be zero and the green row vacuous):
# one URL, one email, one IPv4, one long digit run.
PII_TAIL = (
    " contact bob@example.com or visit https://example.com/a?id=123"
    " node 10.0.0.1 acct 98765432101"
)


def pii_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(PII_TAIL)))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def docs_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    exact = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(NEAR_TAIL)).alias("text"),
    )
    return d.unionByName(exact).unionByName(near)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def emb_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded near-duplicate vectors (the driver corpus has no native
    near-dups, which made the near-dup query vacuously green): scaled
    copies (+100000, ×1.01 — cosine exactly 1.0) and shifted copies
    (+200000, each element +0.05 — high-but-<1 cosine). All arithmetic
    in double AFTER the float→double cast, matching the oracle's
    CAST(embedding AS DOUBLE[]) order of operations."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    base = e.select("vec_id", as_double.alias("embedding"))
    scaled = e.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 1.01).alias("embedding"),
    )
    shifted = e.filter(F.col("vec_id") % 13 == 0).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") + 0.05).alias("embedding"),
    )
    return base.unionByName(scaled).unionByName(shifted)


# ------------------------------------------------------------- queries
def q_dedup_exact(spark, sf_dir):
    return dd.exact_dedup(docs_fixture(spark, sf_dir))


def q_dedup_exact_flags(spark, sf_dir):
    return dd.exact_dedup_keep_first(docs_fixture(spark, sf_dir)).select(
        "doc_id", "is_duplicate"
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    return dd.minhash_lsh_candidates(docs_fixture(spark, sf_dir))


def q_dedup_simhash(spark, sf_dir):
    return dd.simhash(docs_fixture(spark, sf_dir))


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact Jaccard verification restricted to MinHash-LSH candidate
    pairs — the scale path (all-pairs mode is test-only); the oracle
    applies the identical candidate restriction."""
    fix = docs_fixture(spark, sf_dir)
    return dd.ngram_jaccard_pairs(
        fix, threshold=0.5, candidates=dd.minhash_lsh_candidates(fix)
    )


def q_dedup_incremental(spark, sf_dir):
    """Append-batch dedup: the seeded copies (+100000/+200000) arrive
    as a NEW batch probed against the stored band table of the base
    corpus — every emitted pair has ≥1 new side; old×old is never
    recomputed."""
    fix = docs_fixture(spark, sf_dir)
    new = fix.filter(F.col("doc_id") >= 100000)
    old = fix.filter(F.col("doc_id") < 100000)
    return dd.minhash_lsh_candidates_incremental(new, dd.minhash_band_table(old))


def q_dedup_bloom_probe(spark, sf_dir):
    """Append-batch EXACT-dup gate via a packed Bloom bitmap: the base
    corpus's content hashes pack into 2^18 bits of int64 words (one
    bit_or groupBy, ≤4096 rows — broadcastable at any corpus size);
    the seeded batch probes with k=4 broadcast hash joins and NO
    shuffle of the batch. Exact copies (+100000) MUST flag true
    (Bloom has no false negatives); near-copies (+200000, different
    text) come out false modulo the fp rate. The tiny state is
    cached here — in production it is a committed index table that
    ``bloom_merge`` folds each batch into (cheaper than the MinHash
    band-table probe when only exact dups need gating)."""
    fix = docs_fixture(spark, sf_dir).withColumn("content_hash", F.md5("text"))
    base = fix.filter(F.col("doc_id") < 100000)
    batch = fix.filter(F.col("doc_id") >= 100000)
    bloom = sk.bloom_build(base, "content_hash", bits_log2=18, k=4).cache()
    probed = sk.bloom_probe(
        batch, "content_hash", bloom, bits_log2=18, k=4, out_col="maybe_dup"
    )
    return probed.select("doc_id", "maybe_dup")


def q_dedup_jaccard_est(spark, sf_dir):
    """Signature-based Jaccard estimates for the LSH candidate pairs —
    the cheap verification tier (no shingle re-explosion)."""
    fix = docs_fixture(spark, sf_dir)
    return dd.minhash_jaccard_estimate(fix, dd.minhash_lsh_candidates(fix))


def q_dedup_clusters(spark, sf_dir):
    """Full dedup chain: LSH candidates → connected components →
    per-doc cluster id / size / canonical flag (singletons included)."""
    return dd.dedup_clusters(docs_fixture(spark, sf_dir))


def q_dedup_lines(spark, sf_dir):
    """C4-style line-level boilerplate removal: 10-token lines occurring
    >2 times corpus-wide dropped from every doc (the seeded doc_id%77
    triples put most of their lines at count 3)."""
    return dd.line_dedup(docs_fixture(spark, sf_dir), line_tokens=10, max_count=2)


def q_dedup_exact_substr(spark, sf_dir):
    """ExactSubstr-style duplicated-span removal: every token position
    covered by a corpus-wide duplicated word 8-gram is dropped (the
    seeded doc_id%7 exact copies make every gram of those docs dup)."""
    return dd.exact_substring_dedup(docs_fixture(spark, sf_dir), k=8)


def q_embedding_semdedup(spark, sf_dir):
    """SemDeDup: k-means clusters bound the pairwise search; a vector is
    a semantic dup iff a lower-id same-cluster vector has cosine ≥ 0.95
    (catches the seeded ×1.01 and +0.05 copies, keeps the originals).
    The cluster count is DERIVED from the corpus (k = ceil(sqrt(N)),
    the balanced semdedup_k rule: n·k assignment and n²/k pair search
    equalize at n^1.5) so neither term goes quadratic as the corpus
    scales; the oracle derives the same k from the same count at
    runtime."""
    return sim.semantic_dedup(emb_fixture(spark, sf_dir), threshold=0.95)


def q_text_token_count(spark, sf_dir):
    return ts.token_count(_docs(spark, sf_dir))


def q_text_quality(spark, sf_dir):
    return ts.quality_score(_docs(spark, sf_dir))


def q_text_langid(spark, sf_dir):
    return ts.lang_id(_docs(spark, sf_dir))


def q_text_fingerprint(spark, sf_dir):
    return ts.fingerprint(_docs(spark, sf_dir))


# Gopher-rule trippers seeded by modulo (the raw corpus is one-line
# alpha word salad: without seeding, the bullet/ellipsis/symbol/alpha
# rules would all be vacuously green). Applied in fixed order so
# overlapping modulos stay deterministic.
GOPHER_BULLET_TAIL = "\n" + "\n".join(["- filler bullet item"] * 20)
GOPHER_ELLIPSIS_TAIL = "\ntrailing thought...\nanother one..."
GOPHER_HASH_TAIL = " " + " ".join(["#"] * 15)
GOPHER_DIGIT_TAIL = " " + " ".join(str(100 + i) for i in range(40))
# the corpus vocabulary contains at most one of the paper's 8 stop
# words ('the'), so without this tail ok_stopwords — and with it keep —
# would be vacuously all-false
GOPHER_STOP_TAIL = " and that would go with the others to be kept"
_GOPHER_MODS = [
    (6, GOPHER_BULLET_TAIL),
    (8, GOPHER_ELLIPSIS_TAIL),
    (10, GOPHER_HASH_TAIL),
    (15, GOPHER_DIGIT_TAIL),
    (2, GOPHER_STOP_TAIL),
]


def gopher_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    parts = [F.col("text")] + [
        F.when(F.col("doc_id") % m == 0, F.lit(tail)).otherwise(F.lit(""))
        for m, tail in _GOPHER_MODS
    ]
    return d.select("doc_id", F.concat(*parts).alias("text"))


def q_text_gopher_rules(spark, sf_dir):
    """Gopher per-rule quality flags over the seeded fixture: every
    rule has both true and false rows (short docs trip word-count
    naturally; the seeded tails trip bullet/ellipsis/symbol/alpha)."""
    return ts.gopher_rules(gopher_fixture(spark, sf_dir))


# repeated boilerplate seeded onto doc_id%13==0 rows (the raw corpus
# never trips the repetition thresholds, which would leave the
# is_repetitive column vacuously all-false)
REP_TAIL = " click here to subscribe" * 12


def rep_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(REP_TAIL)))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def q_text_repetition(spark, sf_dir):
    return ts.repetition_scores(rep_fixture(spark, sf_dir))


def q_text_corpus_stats(spark, sf_dir):
    return ts.corpus_stats(_docs(spark, sf_dir))


def q_text_quality_percentiles(spark, sf_dir):
    return ts.quality_percentiles(_docs(spark, sf_dir))


def q_text_quality_histogram(spark, sf_dir):
    """Mergeable histogram calibration path: per-domain quality
    histograms built on the even/odd doc_id halves SEPARATELY, merged
    (integer counts add), then bin-resolution p50/p90 — must equal the
    full-corpus computation, so the oracle recomputes from scratch."""
    docs = _docs(spark, sf_dir)
    ha = ts.quality_histogram(docs.filter(F.col("doc_id") % 2 == 0))
    hb = ts.quality_histogram(docs.filter(F.col("doc_id") % 2 == 1))
    return ts.histogram_quantiles(ts.histogram_merge(ha, hb))


def q_text_winnow_candidates(spark, sf_dir):
    """Passage-overlap (containment) candidate pairs over the seeded
    dup fixture — the MOSS-style complement to whole-doc MinHash."""
    return ts.winnow_candidates(docs_fixture(spark, sf_dir))


def q_text_classifier(spark, sf_dir):
    """fastText-style quality-classifier inference, hashing-trick path —
    a pure codegen projection (token weights computed inside one
    F.aggregate fold, no shuffle, no UDF, no model table)."""
    return ts.classifier_score(_docs(spark, sf_dir))


def q_text_vocab(spark, sf_dir):
    """Corpus vocabulary: per-token term frequency + document
    frequency (tokenizer-training input)."""
    return ts.vocab_counts(_docs(spark, sf_dir))


def q_text_pair_lift(spark, sf_dir):
    """Adjacent-token association lift — the integer-exact PMI analog
    (collocation mining): lift = c_xy * N / (c_x * c_y) with staged
    BIGINT division, top-50 via the shared two-level pattern."""
    return ts.pair_lift(_docs(spark, sf_dir), min_count=2, k=50)


def q_text_top_ngrams(spark, sf_dir):
    """Corpus-wide 20 most frequent bigrams via skew-safe two-level
    top-k (boilerplate / stopword-phrase mining)."""
    return ts.top_ngrams(_docs(spark, sf_dir), n=2, k=20)


def q_text_ngram_lm(spark, sf_dir):
    """Count-based trigram LM table: pruned n-gram counts, context
    counts, MLE conditional probabilities."""
    return ts.ngram_lm(_docs(spark, sf_dir), n=3, min_count=2)


def q_text_lm_perplexity(spark, sf_dir):
    """CCNet-style scoring: every document's perplexity under the
    corpus trigram LM (pruned n-grams floor at unk_prob)."""
    d = _docs(spark, sf_dir)
    return ts.lm_perplexity(d, ts.ngram_lm(d, n=3, min_count=2))


def q_prep_cap_per_group(spark, sf_dir):
    """RefinedWeb-style per-domain cap: keep the 10 largest documents
    per source (n_chars desc, doc_id tie-break), two-stage skew-safe
    top-n, every row emitted with kept/rank."""
    return pp.cap_per_group(
        _docs(spark, sf_dir), group_col="source", cap=10, order_col="n_chars"
    )


def q_prep_mix_corpus(spark, sf_dir):
    """Token-budget domain mixing: per-source sampling rates from a
    DoReMi-style weight recipe (src0 upsamples past 1 epoch, src1-3
    downsample, unlisted sources drop) and deterministic per-doc copy
    counts."""
    return pp.mix_corpus(
        _docs(spark, sf_dir),
        weights={"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        token_budget=4000,
    )


def q_text_bpe_pairs(spark, sf_dir):
    """One BPE-training round: corpus-wide adjacent-symbol-pair counts
    weighted by word frequency (vocabulary-bounded explosion)."""
    return ts.bpe_pair_counts(_docs(spark, sf_dir), min_count=2)


# encode merges are CONFIG (a trained tokenizer's merge table), shared
# verbatim by the Spark query and the DuckDB oracle; includes a chained
# second-order merge (t+h then th+e) so the rank-order application and
# multi-char symbols are both exercised.
BPE_FIXTURE_MERGES = [("t", "h"), ("th", "e"), ("e", "r"), ("i", "n")]


def q_text_bpe_train(spark, sf_dir):
    """Full BPE training: 3 merges learned by iterated corpus-wide pair
    argmax + greedy merge application over the vocabulary."""
    return ts.bpe_train(_docs(spark, sf_dir), n_merges=3)


def q_text_bpe_encode(spark, sf_dir):
    """Config-driven BPE encoding of every document (greedy merges in
    rank order; zero-shuffle codegen projection)."""
    return ts.bpe_apply(_docs(spark, sf_dir), BPE_FIXTURE_MERGES)


def q_text_subwords(spark, sf_dir):
    return ts.subword_count(_docs(spark, sf_dir))


# BM25 retrieval queries are CONFIG (a handful of keyword queries),
# shared verbatim with the DuckDB oracle.
BM25_QUERIES = [
    ("q_join", "spark window join"),
    ("q_sort", "hash merge sort"),
    ("q_cust", "customer query stream"),
]


def q_text_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-k keyword retrieval over the corpus (micro-unit
    quantized scores; two-level partial top-k — see bm25_topk)."""
    return ts.bm25_topk(_docs(spark, sf_dir), BM25_QUERIES, k=5)


def q_text_bm25_indexed(spark, sf_dir):
    """BM25 served from the prebuilt inverted index (postings + stats
    tables, corpus text never re-read) — must equal the direct-scan
    path, so it shares its oracle."""
    postings, stats = ts.bm25_index(_docs(spark, sf_dir))
    return ts.bm25_topk_from_index(postings, stats, BM25_QUERIES, k=5)


def q_text_rerank_topk(spark, sf_dir):
    """Two-stage retrieval: BM25 recall (top-20 per query) -> Arrow-
    batched cross-encoder rerank (deterministic fake kernel) -> final
    top-5. The Python stage sees exactly |Q|*20 pairs."""
    docs = _docs(spark, sf_dir)
    cands = ts.bm25_topk(docs, BM25_QUERIES, k=20)
    return rr.crossencoder_rerank(docs, BM25_QUERIES, cands, k=5)


def q_retrieval_topk(spark, sf_dir):
    """The FULL retrieval chain, chunk-grained: fixed-token chunking
    (packed BIGINT chunk ids) -> BM25 inverted index -> index-probe
    recall (top-20 per query, corpus text never re-read) -> Arrow
    cross-encoder rerank -> final top-5. plans/retrieval.py composes
    the same chain over COMMITTED Catalog tables (pytest-covered);
    this query runs it lazily so the oracle checks the whole chain
    end-to-end."""
    from .plans import retrieval as rtr

    cfg = rtr.RetrievalConfig()
    chunks = rtr.build_chunks(_docs(spark, sf_dir), cfg)
    postings, stats = ts.bm25_index(
        chunks, id_col="chunk_uid", text_col="chunk_text"
    )
    recall = ts.bm25_topk_from_index(
        postings, stats, BM25_QUERIES, k=cfg.recall_k, id_col="chunk_uid"
    )
    return rr.crossencoder_rerank(
        chunks, BM25_QUERIES, recall, k=cfg.final_k,
        id_col="chunk_uid", text_col="chunk_text",
    )


def q_text_winnow(spark, sf_dir):
    return ts.winnow_fingerprint(_docs(spark, sf_dir))


def q_ann_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return sim.cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)


def q_ann_hard_negatives(spark, sf_dir):
    """Hard-negative mining with the exact top-2 neighbors standing in
    for labeled positives (guarantees the anti-join bites: every
    excluded pair WOULD have ranked 1-2), negatives = next 5."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 8)
    pos = sim.cosine_topk(emb, q, k=2).select(
        "query_id", F.col("neighbor_id").alias("vec_id")
    )
    return sim.mine_hard_negatives(emb, q, pos, n=5)


def q_ann_lsh_buckets(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return sim.lsh_buckets(emb, sim.make_anchors(emb, 4))


def q_ann_lsh_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return sim.lsh_topk(emb, emb.filter(F.col("vec_id") < 8), sim.make_anchors(emb, 4), k=5)


def q_ann_ivf_assign(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return sim.ivf_assign(emb, sim.make_anchors(emb, 4))


def q_ann_ivf_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return sim.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 8), sim.make_anchors(emb, 4), k=5, nprobe=2
    )


def q_ann_ivf_train_centroids(spark, sf_dir):
    """Trained coarse-quantizer centroids, scalarized to (cid, pos,
    val) rows for the driver canonicalizer."""
    emb = _emb(spark, sf_dir)
    cent = sim.ivf_train(emb, k=4, iters=2)
    return cent.select(
        F.col("anchor_rank").alias("cid"),
        F.posexplode("embedding").alias("pos", "val"),
    )


def q_ann_ivf_train_assign(spark, sf_dir):
    """Cluster assignment under the TRAINED centroids (vs the raw
    first-k anchors of ann_ivf_assign)."""
    emb = _emb(spark, sf_dir)
    return sim.ivf_assign(emb, sim.ivf_train(emb, k=4, iters=2))


def q_ann_pq_codebooks(spark, sf_dir):
    """Trained product-quantization codebooks (m=4 subspaces × ksub=4
    codes over the 64-dim embeddings), scalarized to (sub, code, pos,
    val) rows for the driver canonicalizer."""
    emb = _emb(spark, sf_dir)
    cb = sim.pq_train(emb, m=4, ksub=4, iters=2)
    return cb.select(
        "sub", "code", F.posexplode("subvec").alias("pos", "val")
    )


def q_ann_pq_codes(spark, sf_dir):
    """PQ-encoded corpus: one (vec_id, sub, code) row per subspace."""
    emb = _emb(spark, sf_dir)
    return sim.pq_encode(emb, sim.pq_train(emb, m=4, ksub=4, iters=2))


def q_ann_pq_topk(spark, sf_dir):
    """ADC top-k over PQ codes (integer-exact micro-unit distances)."""
    emb = _emb(spark, sf_dir)
    cb = sim.pq_train(emb, m=4, ksub=4, iters=2)
    return sim.pq_adc_topk(emb, emb.filter(F.col("vec_id") < 8), cb, k=5)


def q_ann_pq_refined(spark, sf_dir):
    """ADC shortlist (R=20) -> exact-distance re-rank of only those
    candidates against true vectors -> top-5 (IVFADC+refine recall
    fix; the exact math touches |Q|x20 rows, never the corpus)."""
    emb = _emb(spark, sf_dir)
    cb = sim.pq_train(emb, m=4, ksub=4, iters=2)
    return sim.pq_refine_topk(
        emb, emb.filter(F.col("vec_id") < 8), cb, k=5, refine_r=20
    )


def q_ann_ivfadc_topk(spark, sf_dir):
    """TRUE IVFADC + refine (Jégou et al. PAMI 2011 §V — the FAISS
    IVFADC architecture): each query probes its nprobe=2 IVF cells,
    ADC scores PQ codes ONLY inside those cells (broadcast equi-join
    on cell, never a full-corpus code scan), then the R=20 shortlist
    is exactly re-ranked. The oracle restricts its ADC to the same
    probed cells."""
    emb = _emb(spark, sf_dir)
    cb = sim.pq_train(emb, m=4, ksub=4, iters=2)
    return sim.pq_refine_topk(
        emb, emb.filter(F.col("vec_id") < 8), cb, k=5, refine_r=20,
        centroids=sim.make_anchors(emb, 4), nprobe=2,
    )


def q_ann_index_served(spark, sf_dir):
    """IVFADC served from a COMMITTED index (plans/ann_index.py): the
    build trains/encodes and commits centroids, codebooks, codes and
    vectors partitioned by cell through Catalog+RunManifest; serving
    partition-prunes to the probed cells and never re-encodes the
    corpus. Same config as ann_ivfadc_topk, so it shares that oracle —
    the green row proves the committed-serving path equals the from-
    scratch computation value-for-value."""
    import atexit
    import shutil
    import tempfile

    from .plans import ann_index as aidx

    # fresh root per call, removed at interpreter exit (after every
    # lazy read of the committed tables has been consumed) — a bare
    # mkdtemp leaked a corpus-sized index copy per invocation
    root = tempfile.mkdtemp(prefix="annidx-q-")
    atexit.register(shutil.rmtree, root, True)
    cfg = aidx.AnnIndexConfig(out_root=root, run_id="q1")
    emb = _emb(spark, sf_dir)
    aidx.run_index(spark, emb, cfg)
    return aidx.query_index(spark, cfg, emb.filter(F.col("vec_id") < 8))


def q_embedding_pca_cov(spark, sf_dir):
    """Distributed half of PCA: the d x d covariance from one pass of
    integer-exact quantized moments (map-side-combined; only
    partitions x d^2/2 partial rows shuffle)."""
    return rd.covariance_moments(_emb(spark, sf_dir))


def q_embedding_jl_project(spark, sf_dir):
    """Johnson-Lindenstrauss sparse random projection to 8 dims —
    md5-derived deterministic Achlioptas matrix, zero-shuffle codegen
    folds (the cheap distance-preserving reducer before LSH)."""
    return rd.jl_project(_emb(spark, sf_dir), out_dim=8, round_to=4, in_dim=64)


def q_embedding_neardup(spark, sf_dir):
    emb = emb_fixture(spark, sf_dir)
    return sim.embedding_neardup_pairs(emb, sim.make_anchors(emb, 4), threshold=0.9)


def q_multimodal_metadata(spark, sf_dir):
    return mm.media_metadata(mm.attach_fake_media(_docs(spark, sf_dir)))


def q_multimodal_features(spark, sf_dir):
    """mapInPandas feature extraction, scalarized for the driver's
    canonicalizer (raw array<double> columns are unhashable there) —
    the rounded per-feature columns also enable a real DuckDB oracle
    over the deterministic fake kernel (md5-arithmetic both engines
    reproduce)."""
    feats = mm.extract_features(mm.attach_fake_media(_docs(spark, sf_dir)))
    return feats.select(
        "doc_id",
        "media_format",
        *[
            F.round(F.element_at("features", i + 1), 6).alias(f"f{i}")
            for i in range(mm.FEATURE_DIM)
        ],
    )


def q_multimodal_resize(spark, sf_dir):
    """mapInPandas resize plumbing: same rows, new bytes + dims. The
    output bytes are emitted as lowercase hex so the deterministic fake
    kernel (md5 over hex(media) + target dims) has a SQL oracle."""
    out = mm.resize_media(mm.attach_fake_media(_docs(spark, sf_dir)), 32, 24)
    return out.select(
        "doc_id", "media_format", "media_width", "media_height",
        "media_n_bytes", F.lower(F.hex("media")).alias("media_hex"),
    )


def q_multimodal_frames(spark, sf_dir):
    """mapInPandas frame sampling — the one-to-many media op; frame
    bytes emitted as hex for the oracle."""
    out = mm.sample_frames(mm.attach_fake_media(_docs(spark, sf_dir)), 3)
    return out.select(
        "doc_id", "frame_idx", "frame_n_bytes",
        F.lower(F.hex("frame")).alias("frame_hex"),
    )


def _phash_table(spark, sf_dir):
    return mm.media_phash(mm.attach_fake_media(_docs(spark, sf_dir)))


def q_multimodal_phash(spark, sf_dir):
    """64-bit perceptual hash as 4 sign-safe 16-bit band columns —
    pure codegen over the media bytes (fake DCT kernel; see
    multimodal.media_phash)."""
    return _phash_table(spark, sf_dir)


def q_multimodal_phash_neardup(spark, sf_dir):
    """Multi-index Hamming near-dup over the phash bands. Seeded both
    ways: doc_id%25 rows get a 3-bit-flipped copy (inside max_hamming=3
    — must pair with their base) and doc_id%40 rows a copy with 4 bits
    flipped inside band0 only (bands 1-3 still match, so the pair IS a
    band candidate but hamming 4 > 3 — proving the exact filter, not
    just banding, decides membership)."""
    base = _phash_table(spark, sf_dir)
    near = base.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        "phash_hex",
        F.expr("band0 ^ 1").alias("band0"),
        "band1",
        F.expr("band2 ^ 6").alias("band2"),
        "band3",
    )
    far = base.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        "phash_hex",
        F.expr("band0 ^ 15").alias("band0"),
        "band1",
        "band2",
        "band3",
    )
    return mm.phash_neardup(base.unionByName(near).unionByName(far))


def url_fixture(spark, sf_dir):
    """Deterministic URL per document, varying every normalization
    axis: scheme case, www prefix, host case, trailing slash, utm
    tracking params mixed with a real param, fragments. norm_url
    collapses to doc_id % 100 — 5 copies per URL at sf0.01."""
    d = _docs(spark, sf_dir).select("doc_id")
    i = F.col("doc_id")
    url = F.concat(
        F.when(i % 2 == 0, F.lit("https://")).otherwise(F.lit("HTTP://")),
        F.when(i % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Site"), (i % 50).cast("string"), F.lit(".Example.COM"),
        F.lit("/page/"), (i % 100).cast("string"),
        F.when(i % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(i % 5 == 0, F.lit("?utm_source=feed&id=7&utm_medium=x"))
        .when(i % 5 == 1, F.lit("?id=7"))
        .otherwise(F.lit("")),
        F.when(i % 7 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    return d.select("doc_id", url.alias("url"))


def q_prep_url_normalize(spark, sf_dir):
    return pp.normalize_urls(url_fixture(spark, sf_dir))


def q_prep_url_dedup(spark, sf_dir):
    """URL-level dedup over canonical forms — the RefinedWeb first
    tier. id%5 in {0,1} keeps ?id=7 after utm stripping, so the five
    same-page variants of each (host, path) collapse either way."""
    return pp.url_dedup(url_fixture(spark, sf_dir))


def q_dedup_survivors(spark, sf_dir):
    """Quality-aware survivor selection over LSH+CC clusters: highest
    quality (here: text length — the near-dup +200000 copies carry an
    appended tail, so quality genuinely overrides the lowest-id rule),
    ties broken by lowest id (exact +100000 copies lose to their
    originals)."""
    d = docs_fixture(spark, sf_dir)
    clusters = dd.dedup_clusters(d)
    qual = d.select("doc_id", F.length("text").cast("bigint").alias("quality"))
    return dd.cluster_survivors(clusters, qual)


def q_prep_scrub(spark, sf_dir):
    return pp.scrub_text(pii_fixture(spark, sf_dir))


def q_prep_curate(spark, sf_dir):
    """Flagship curation chain over a fixture seeded with BOTH
    duplicates (docs_fixture) and PII tails — exercises scrub, dedup,
    quality, lang-ID, and split in the one-shuffle composite plan."""
    d = docs_fixture(spark, sf_dir)
    seeded = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(PII_TAIL)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return pp.curate(seeded)


def q_prep_split(spark, sf_dir):
    return pp.assign_split(_docs(spark, sf_dir))


def q_prep_pack(spark, sf_dir):
    return pp.pack_sequences(_docs(spark, sf_dir), budget=512, n_shards=8)


def q_prep_chunks(spark, sf_dir):
    """Fixed-token chunks with overlap (64-token chunks, 16 overlap)."""
    return pp.chunk_documents(_docs(spark, sf_dir), chunk_tokens=64, overlap=16)


def q_prep_shuffle(spark, sf_dir):
    """Deterministic global training-order shuffle via distributed
    rank (range partition + local rank + broadcast offsets)."""
    return pp.shuffle_deterministic(_docs(spark, sf_dir))


def q_prep_split_by_cluster(spark, sf_dir):
    """Leakage-proof splits: split assignment hashed on the near-dup
    CLUSTER id, so no near-duplicate pair ever straddles train/test —
    the composition dedup_clusters → assign_split."""
    labels = dd.dedup_clusters(docs_fixture(spark, sf_dir)).select(
        "doc_id", "cluster_id"
    )
    sp = pp.assign_split(
        labels.select("cluster_id").distinct(), id_col="cluster_id"
    ).select("cluster_id", "split")
    return labels.join(sp, "cluster_id").select("doc_id", "cluster_id", "split")


def eval_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic held-out 'benchmark' slice: every 50th document."""
    return _docs(spark, sf_dir).filter(F.col("doc_id") % 50 == 0).select(
        "doc_id", "text"
    )


def q_prep_dsir_weights(spark, sf_dir):
    """DSIR hashed-bigram importance weights of the raw corpus against
    the eval slice as the target domain; integer micro-nat log-weights
    so the per-doc sum is order-independent and hash-stable."""
    return pp.dsir_weights(
        docs_fixture(spark, sf_dir), eval_fixture(spark, sf_dir),
        n=2, buckets=256,
    )


def q_prep_decontaminate(spark, sf_dir):
    """8-gram test-set-overlap check: the eval slice's own rows AND
    their +100000 exact copies from docs_fixture must both flag."""
    return pp.decontaminate(docs_fixture(spark, sf_dir), eval_fixture(spark, sf_dir))


def q_prep_decontaminate_neardup(spark, sf_dir):
    """LSH-tier decontamination: eval docs' own fixture rows, their
    +100000 exact copies AND their +200000 near-dup (appended-tail)
    copies must flag — the tail breaks every 8-gram ending past the
    original text but leaves whole-doc Jaccard high, which is exactly
    the leak class the n-gram tier misses."""
    return pp.decontaminate_neardup(
        docs_fixture(spark, sf_dir), eval_fixture(spark, sf_dir)
    )


def strata_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed domain labels (60/30/10) — the driver corpus's `source`
    is uniform, which would make temperature reweighting vacuous."""
    stratum = (
        F.when(F.col("doc_id") % 10 < 6, F.lit("web"))
        .when(F.col("doc_id") % 10 < 9, F.lit("books"))
        .otherwise(F.lit("code"))
    )
    return _docs(spark, sf_dir).select("doc_id", stratum.alias("stratum"))


def q_prep_sample_stratified(spark, sf_dir):
    return pp.stratified_sample(
        _docs(spark, sf_dir),
        {"src0": 1.0, "src1": 0.5, "src2": 0.25},
        strata_col="source",
    )


def q_prep_sample_temperature(spark, sf_dir):
    return pp.temperature_sample(
        strata_fixture(spark, sf_dir),
        strata_col="stratum",
        alpha=0.5,
        target_frac=0.5,
    )


def q_curation_audit(spark, sf_dir):
    """The FULL curation DAG's per-document decision table: seeded
    fixture (exact + near dups, PII tails, skewed strata) through
    curate → LSH+CC near-dup clustering → decontamination →
    temperature sampling — every stage non-vacuous, one row per input
    doc with the first drop reason that fired."""
    from .plans import curation

    d = docs_fixture(spark, sf_dir)
    stratum = (
        F.when(F.col("doc_id") % 10 < 6, F.lit("web"))
        .when(F.col("doc_id") % 10 < 9, F.lit("books"))
        .otherwise(F.lit("code"))
    )
    seeded = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(PII_TAIL)))
        .otherwise(F.col("text"))
        .alias("text"),
        stratum.alias("stratum"),
    )
    cfg = curation.CurationConfig(
        strata_col="stratum", temperature_alpha=0.5, target_frac=0.5
    )
    return curation.build_audit(seeded, eval_fixture(spark, sf_dir), cfg)


def q_text_cms_counts(spark, sf_dir):
    """Count-min sketch round trip: token frequencies sketched into a
    4 x 16-cell state (width deliberately fixture-small — the driver
    corpus's ~31-token vocab into 16 buckets forces collisions, so the
    one-sided overcount path is actually exercised; production width
    is 2^10+), then every vocab token point-queried back against the
    sketch. cnt_est >= cnt_exact always; overcount is the collision
    error the min-over-rows bounds."""
    toks = _docs(spark, sf_dir).select(
        F.explode(ts.tokens("text")).alias("token")
    )
    cms = sk.cms_build(toks, "token", depth=4, width_log2=4).cache()
    vocab = toks.groupBy("token").agg(F.count("*").alias("cnt_exact"))
    est = sk.cms_estimate(
        vocab, "token", cms, depth=4, width_log2=4, out_col="cnt_est"
    )
    return est.select(
        "token",
        "cnt_exact",
        "cnt_est",
        (F.col("cnt_est") - F.col("cnt_exact")).alias("overcount"),
    )


def q_prep_sample_weighted(spark, sf_dir):
    """Fixed-size weighted draw: the 50 corpus docs with the smallest
    integer priority (h(id) << 20) DIV n_chars — longer documents win
    proportionally more often; ranking is exact BIGINT arithmetic end
    to end."""
    return pp.priority_sample(
        _docs(spark, sf_dir), k=50, weight_col="n_chars"
    )


NORM_TAIL = "  Él dijo: 42 Cafés!!  El dijo 00 cafes  "


def norm_fixture(spark, sf_dir):
    """Accents/digits/punct/extra-whitespace seeded onto doc_id%9==0
    rows (the raw corpus is already lowercase ASCII word salad, which
    normalization would pass through untouched)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 9 == 0, F.concat(F.col("text"), F.lit(NORM_TAIL)))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def q_text_normalize(spark, sf_dir):
    """CCNet canonical form + hash: the seeded tail's two renderings
    ('Él dijo: 42 Cafés!!' / 'el dijo 00 cafes') collapse to identical
    normalized text."""
    return ts.normalize_text(norm_fixture(spark, sf_dir))


def q_text_classifier_train(spark, sf_dir):
    """Distributed hard-sigmoid logistic training, 2 full-batch GD
    iterations over 16+1 hashed buckets; label = doc contains the
    token 'spark' (fixture vocabulary), so the learned weights are a
    real signal, not noise. Bit-exact integer micro-unit arithmetic —
    the oracle replays both iterations as unrolled CTEs."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "text",
        F.array_contains(ts.tokens("text"), "spark").alias("label"),
    )
    return ts.train_linear_classifier(d, iters=2, dim=16)


def q_classifier_auc(spark, sf_dir):
    """Exact Mann-Whitney ROC-AUC of the hashed classifier's margin
    against the 'doc contains token spark' ground truth — completes
    the train/infer/evaluate loop. The score is the integer micro-unit
    mean hashed token weight (floor-div, pmod-exact), so every rank
    comparison is BIGINT and the AUC numerator is bit-reproducible."""
    tok = ts.tokens("text")
    w_milli = lambda t: (  # noqa: E731  — (md5 % 2001) - 1000 ∈ [-1000, 1000]
        F.conv(
            F.substring(F.md5(F.concat_ws("#", t, F.lit("clf-v1"))), 1, 8), 16, 10
        ).cast("bigint")
        % 2001
        - 1000
    )
    sum_milli = F.aggregate(tok, F.lit(0).cast("bigint"), lambda a, t: a + w_milli(t))
    n = F.size(tok).cast("bigint")
    a = sum_milli * 1000
    score_u = F.when(n > 0, ((a - F.pmod(a, n)) / n).cast("bigint")).otherwise(
        F.lit(0).cast("bigint")
    )
    scored = _docs(spark, sf_dir).select(
        score_u.alias("score_u"),
        F.array_contains(tok, "spark").alias("label"),
    )
    return ts.ranking_auc(scored)


def q_embed_hash(spark, sf_dir):
    """Hashed text embedding (signed feature hashing, dim=16) — the
    text→vector bridge to the embedding-side ops. Emits scalar
    summaries + md5 of the exact integer vector (driver-canonicalizable
    AND fully oracle-checkable: pure md5 arithmetic)."""
    emb = ts.hashed_embedding(_docs(spark, sf_dir), dim=16)
    return emb.select(
        "doc_id",
        "nnz",
        "norm_sq",
        F.md5(
            F.array_join(F.transform("vec", lambda x: x.cast("string")), ",")
        ).alias("vec_md5"),
    )


def q_embed_hash_topk(spark, sf_dir):
    """Nearest neighbors by sparse inner product over the hashed
    embedding components for a bounded QUERY set (doc_id % 100 == 0)
    against the whole corpus: inverted-index join on the feature
    bucket, integer-exact ranking. The query restriction is what keeps
    this linear in the corpus — the fixture vocabulary is tiny (~31
    words), so every feature is hot and an UNRESTRICTED posting-list
    self-join is Σ_b |posting(b)|² ≈ all-pairs whatever the hashing
    dimension (measured: 200 s at sf0.1 vs ~2 s restricted); dense
    corpus×corpus top-k belongs to the LSH/IVF candidate paths."""
    docs = _docs(spark, sf_dir)
    comp = ts.hashed_components(docs, dim=4096)
    q = docs.filter(F.col("doc_id") % 100 == 0).select("doc_id")
    return sim.sparse_dot_topk(comp, k=1, queries=q)


def q_text_lm_backoff(spark, sf_dir):
    """Stupid-backoff scoring, corpus self-trained: trigram tier when
    the pruned trigram survives, else 0.4-damped bigram tier, else
    0.16-damped unigram tier — per-doc tier hit counts are exact
    integers, costs integer micro-bits."""
    return ts.lm_backoff_score(_docs(spark, sf_dir), n=3, min_count=2)


def q_text_ppl_buckets(spark, sf_dir):
    """CCNet head/middle/tail bucketing: per-source perplexity
    tertiles over the corpus-trained trigram LM, every cut and
    comparison in integer micro-bit space."""
    d = _docs(spark, sf_dir)
    return ts.ppl_buckets(d, ts.ngram_lm(d, n=3, min_count=2))


def q_graph_pagerank(spark, sf_dir):
    """Fixed-iteration exact-integer PageRank over a deterministic
    97-node synthetic link graph derived from doc ids (the corpus-side
    host-ranking pass; see functions/graph.py). 4 rounds, damping
    0.85, every step BIGINT floor arithmetic so the DuckDB oracle
    replays it bit-exactly."""
    from .functions import graph as gr

    d = _docs(spark, sf_dir)
    edges = d.select(
        (F.col("doc_id") % 97).alias("src"),
        ((F.col("doc_id") * 31 + 7) % 97).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return gr.pagerank(edges, iters=4)


def q_graph_triangles(spark, sf_dir):
    """Per-node triangle counts over the same 97-node synthetic link
    graph — degree-ordered orientation (Suri-Vassilvitskii), so no
    node's wedge fan-out exceeds O(sqrt(m)). The oracle counts the
    triangles by direct a<b<c three-way join — a different algorithm
    validating the oriented construction. The edge set unions a linear
    and a quadratic rule: the pagerank permutation graph alone is
    cycle-only (ZERO triangles — a vacuously green query), the union
    carries 6 triangles at sf0.01."""
    from .functions import graph as gr

    d = _docs(spark, sf_dir)
    lin = d.select(
        (F.col("doc_id") % 97).alias("src"),
        ((F.col("doc_id") * 31 + 7) % 97).alias("dst"),
    )
    # square the RESIDUE, not doc_id: (doc_id%97)^2 is overflow-free at
    # any id where doc_id*doc_id exceeds BIGINT past ~3.04e9
    r = F.col("doc_id") % 97
    quad = d.select(r.alias("src"), ((r * r + 1) % 97).alias("dst"))
    edges = lin.unionByName(quad).filter(F.col("src") != F.col("dst"))
    return gr.triangle_counts(edges)


QUERIES = {
    "graph_pagerank": q_graph_pagerank,
    "graph_triangles": q_graph_triangles,
    "curation_audit": q_curation_audit,
    "prep_scrub": q_prep_scrub,
    "prep_url_normalize": q_prep_url_normalize,
    "prep_url_dedup": q_prep_url_dedup,
    "dedup_survivors": q_dedup_survivors,
    "prep_curate": q_prep_curate,
    "prep_split": q_prep_split,
    "prep_pack": q_prep_pack,
    "prep_decontaminate": q_prep_decontaminate,
    "prep_decontaminate_neardup": q_prep_decontaminate_neardup,
    "prep_sample_weighted": q_prep_sample_weighted,
    "text_cms_counts": q_text_cms_counts,
    "text_lm_backoff": q_text_lm_backoff,
    "text_normalize": q_text_normalize,
    "text_ppl_buckets": q_text_ppl_buckets,
    "prep_dsir_weights": q_prep_dsir_weights,
    "prep_chunks": q_prep_chunks,
    "prep_shuffle": q_prep_shuffle,
    "prep_split_by_cluster": q_prep_split_by_cluster,
    "prep_sample_stratified": q_prep_sample_stratified,
    "prep_sample_temperature": q_prep_sample_temperature,
    "dedup_exact": q_dedup_exact,
    "dedup_exact_flags": q_dedup_exact_flags,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_clusters": q_dedup_clusters,
    "dedup_lines": q_dedup_lines,
    "dedup_exact_substr": q_dedup_exact_substr,
    "dedup_incremental": q_dedup_incremental,
    "dedup_jaccard_est": q_dedup_jaccard_est,
    "dedup_bloom_probe": q_dedup_bloom_probe,
    "text_token_count": q_text_token_count,
    "text_quality": q_text_quality,
    "text_gopher_rules": q_text_gopher_rules,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "text_classifier": q_text_classifier,
    "text_classifier_train": q_text_classifier_train,
    "classifier_auc": q_classifier_auc,
    "embed_hash": q_embed_hash,
    "embed_hash_topk": q_embed_hash_topk,
    "text_vocab": q_text_vocab,
    "text_top_ngrams": q_text_top_ngrams,
    "text_pair_lift": q_text_pair_lift,
    "text_ngram_lm": q_text_ngram_lm,
    "text_lm_perplexity": q_text_lm_perplexity,
    "text_bpe_pairs": q_text_bpe_pairs,
    "text_bpe_train": q_text_bpe_train,
    "text_bpe_encode": q_text_bpe_encode,
    "text_bm25_topk": q_text_bm25_topk,
    "text_bm25_indexed": q_text_bm25_indexed,
    "text_rerank_topk": q_text_rerank_topk,
    "retrieval_topk": q_retrieval_topk,
    "prep_cap_per_group": q_prep_cap_per_group,
    "prep_mix_corpus": q_prep_mix_corpus,
    "text_subwords": q_text_subwords,
    "text_winnow": q_text_winnow,
    "text_repetition": q_text_repetition,
    "text_corpus_stats": q_text_corpus_stats,
    "text_quality_percentiles": q_text_quality_percentiles,
    "text_quality_histogram": q_text_quality_histogram,
    "text_winnow_candidates": q_text_winnow_candidates,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_hard_negatives": q_ann_hard_negatives,
    "ann_lsh_buckets": q_ann_lsh_buckets,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_assign": q_ann_ivf_assign,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_train_centroids": q_ann_ivf_train_centroids,
    "ann_ivf_train_assign": q_ann_ivf_train_assign,
    "ann_pq_codebooks": q_ann_pq_codebooks,
    "ann_pq_codes": q_ann_pq_codes,
    "ann_pq_topk": q_ann_pq_topk,
    "ann_pq_refined": q_ann_pq_refined,
    "ann_ivfadc_topk": q_ann_ivfadc_topk,
    "ann_index_served": q_ann_index_served,
    "embedding_neardup": q_embedding_neardup,
    "embedding_pca_cov": q_embedding_pca_cov,
    "embedding_jl_project": q_embedding_jl_project,
    "embedding_semdedup": q_embedding_semdedup,
    "multimodal_metadata": q_multimodal_metadata,
    "multimodal_features": q_multimodal_features,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_phash": q_multimodal_phash,
    "multimodal_phash_neardup": q_multimodal_phash_neardup,
}


# ------------------------------------------------------------- oracles
_DOCS_CTE = f"""docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL SELECT doc_id + 200000, text || '{NEAR_TAIL}' FROM documents WHERE doc_id % 11 = 0
)"""

_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

_SHINGLES3 = (
    "[array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]"
)

_HASH = "(('0x' || substr(md5(shingle || '#' || CAST(i AS VARCHAR)), 1, 8)))::BIGINT"

# word 8-grams for decontamination (same construction as _SHINGLES3 at
# n=8; docs shorter than 8 tokens yield none on both sides)
_NG8 = "[array_to_string(w[i:i+7], ' ') for i in range(1, len(w) - 6)]"

_SAMPLE_FRAC = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#sample-v1'), 1, 8)))::BIGINT"
    " / 4294967296.0"
)

ORACLES: dict[str, str] = {}

# staged scrub, identical stage order to prep.SCRUB_STAGES; counts are
# taken against the text AS OF each stage (BIGINT casts: DuckDB len()
# is BIGINT already, the + chain stays BIGINT)
ORACLES["prep_scrub"] = f"""WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || '{PII_TAIL}' ELSE text END AS t
  FROM documents
),
s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, 'https?://\\S+')) AS BIGINT) AS n_url,
         regexp_replace(t, 'https?://\\S+', '<URL>', 'g') AS t
  FROM p
),
s2 AS (
  SELECT doc_id, n_url,
         CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g') AS t
  FROM s1
),
s3 AS (
  SELECT doc_id, n_url, n_email,
         CAST(len(regexp_extract_all(t, '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b')) AS BIGINT) AS n_ip,
         regexp_replace(t, '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b', '<IP>', 'g') AS t
  FROM s2
),
s4 AS (
  SELECT doc_id, n_url, n_email, n_ip,
         CAST(len(regexp_extract_all(t, '[0-9]{{9,}}')) AS BIGINT) AS n_number,
         regexp_replace(t, '[0-9]{{9,}}', '<NUM>', 'g') AS t
  FROM s3
)
SELECT doc_id, t AS scrubbed, n_url, n_email, n_ip, n_number,
       n_url + n_email + n_ip + n_number AS n_redactions
FROM s4"""

_EN = "['the','and','of','to','in','is','that','with']"
_DE = "['der','die','das','und','ist','nicht','mit','ein']"
_ES = "['el','la','los','las','que','es','con','una']"
_FR = "['le','la','les','et','est','que','des','une']"

_STOKS = _TOKS.replace("lower(text)", "lower(scrubbed)")

# shared curate chain (seeded-PII scrub → quality/lang → exact-dup →
# decide): prefix for prep_curate and the full curation_audit oracle
_CURATE_CTES = f"""{_DOCS_CTE},
pii AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || '{PII_TAIL}' ELSE text END AS t
  FROM docs
),
s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, 'https?://\\S+')) AS BIGINT) AS n_url,
         regexp_replace(t, 'https?://\\S+', '<URL>', 'g') AS t
  FROM pii
),
s2 AS (
  SELECT doc_id, n_url,
         CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g') AS t
  FROM s1
),
s3 AS (
  SELECT doc_id, n_url, n_email,
         CAST(len(regexp_extract_all(t, '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b')) AS BIGINT) AS n_ip,
         regexp_replace(t, '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b', '<IP>', 'g') AS t
  FROM s2
),
s4 AS (
  SELECT doc_id, n_url + n_email + n_ip
         + CAST(len(regexp_extract_all(t, '[0-9]{{9,}}')) AS BIGINT) AS n_redactions,
         regexp_replace(t, '[0-9]{{9,}}', '<NUM>', 'g') AS scrubbed
  FROM s3
),
scored AS (
  SELECT doc_id, scrubbed, n_redactions,
         CAST(len({_STOKS}) AS BIGINT) AS n_tokens,
         round(least(len({_STOKS}) / 100.0, 1.0) * 0.4
               + (len(list_filter({_STOKS}, x -> list_contains({_EN}, x)))
                  / greatest(len({_STOKS}), 1)) * 0.3
               + (len(list_distinct({_STOKS}))
                  / greatest(len({_STOKS}), 1)) * 0.3, 4) AS quality,
         len(list_filter({_STOKS}, x -> list_contains({_EN}, x))) AS c_en,
         len(list_filter({_STOKS}, x -> list_contains({_DE}, x))) AS c_de,
         len(list_filter({_STOKS}, x -> list_contains({_ES}, x))) AS c_es,
         len(list_filter({_STOKS}, x -> list_contains({_FR}, x))) AS c_fr
  FROM s4
),
langed AS (
  SELECT *, CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
                 WHEN c_de >= c_es AND c_de >= c_fr THEN 'de'
                 WHEN c_es >= c_fr THEN 'es'
                 ELSE 'fr' END AS lang_pred
  FROM scored
),
flagged AS (
  SELECT *, row_number() OVER (PARTITION BY md5(scrubbed) ORDER BY doc_id) > 1 AS is_duplicate
  FROM langed
),
decided AS (
  SELECT *, CASE WHEN is_duplicate THEN 'duplicate'
                 WHEN lang_pred <> 'en' THEN 'lang'
                 WHEN quality < 0.3 THEN 'quality'
            END AS drop_reason,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split-v1'), 1, 8)))::BIGINT
           / 4294967296.0 AS frac
  FROM flagged
)"""

ORACLES["prep_curate"] = f"""WITH {_CURATE_CTES}
SELECT doc_id, n_redactions, n_tokens, quality, lang_pred, is_duplicate,
       drop_reason IS NULL AS kept, drop_reason,
       CASE WHEN drop_reason IS NULL THEN round(frac, 6) END AS hash_frac,
       CASE WHEN drop_reason IS NULL THEN
         CASE WHEN frac < 0.9 THEN 'train' WHEN frac < 0.95 THEN 'val' ELSE 'test' END
       END AS split
FROM decided"""

# full curation DAG oracle: the curate chain, then LSH+recursive-CC
# clustering of the survivors' SCRUBBED text, 8-gram decontamination
# vs the eval slice, temperature sampling over the remaining docs —
# all composed from the same independent constructions the per-stage
# oracles use.
_STOK_EXPR = (
    "list_filter(string_split_regex(lower(scrubbed), '[^a-z0-9]+'), x -> x <> '')"
)

ORACLES["curation_audit"] = f"""WITH RECURSIVE {_CURATE_CTES},
kept1 AS (SELECT doc_id, scrubbed FROM decided WHERE drop_reason IS NULL),
ktok AS (SELECT doc_id, {_STOK_EXPR} AS w FROM kept1),
ksh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM ktok)
),
kbase AS (
  SELECT doc_id, (('0x' || substr(md5(shingle || '#0'), 1, 8)))::BIGINT AS h0 FROM ksh
),
ksig AS (
  SELECT doc_id, i,
         min((h0 * (2*i + 3) + i * 2654435761) % 2147483647) AS minhash
  FROM kbase, range(0, 12) r(i)
  GROUP BY doc_id, i
),
kband AS (
  SELECT doc_id, CAST(i // 4 AS INT) AS band,
         md5(array_to_string(list(CAST(minhash AS VARCHAR) ORDER BY i), ',')) AS band_key
  FROM ksig GROUP BY doc_id, CAST(i // 4 AS INT)
),
kcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kband a JOIN kband b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
),
ksym AS (
  SELECT doc_a AS u, doc_b AS v FROM kcand
  UNION ALL SELECT doc_b, doc_a FROM kcand
),
reach(node, comp) AS (
  SELECT doc_id, doc_id FROM kept1
  UNION
  SELECT e.v, r.comp FROM reach r JOIN ksym e ON e.u = r.node
),
lab AS (SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node),
canon AS (
  SELECT k.doc_id, k.scrubbed
  FROM kept1 k JOIN lab ON lab.doc_id = k.doc_id AND lab.cluster_id = k.doc_id
),
ctok AS (SELECT doc_id, {_STOK_EXPR} AS w FROM canon),
cng AS (
  SELECT DISTINCT doc_id, ng
  FROM (SELECT doc_id, unnest({_NG8}) AS ng FROM ctok WHERE len(w) >= 8)
),
cetok AS (SELECT {_TOKS} AS w FROM documents WHERE doc_id % 50 = 0),
ceng AS (
  SELECT DISTINCT ng
  FROM (SELECT unnest({_NG8}) AS ng FROM cetok WHERE len(w) >= 8)
),
chit AS (SELECT doc_id, count(*) AS h FROM cng JOIN ceng USING (ng) GROUP BY doc_id),
contam AS (
  SELECT c.doc_id, coalesce(h, 0) > 0 AS contaminated
  FROM canon c LEFT JOIN chit USING (doc_id)
),
survd AS (SELECT doc_id FROM contam WHERE NOT contaminated),
sstr AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 6 THEN 'web'
              WHEN doc_id % 10 < 9 THEN 'books'
              ELSE 'code' END AS stratum
  FROM survd
),
scnt AS (SELECT stratum, count(*) AS n_s FROM sstr GROUP BY stratum),
sww AS (SELECT stratum, n_s, pow(CAST(n_s AS DOUBLE), 0.5) AS w FROM scnt),
st AS (SELECT sum(w) AS sw, CAST(sum(n_s) AS DOUBLE) AS total FROM sww),
sr AS (
  SELECT stratum,
         least(CAST(1.0 AS DOUBLE), ((w / st.sw) * (0.5 * st.total)) / n_s) AS rate
  FROM sww, st
),
sdec AS (
  SELECT s.doc_id, {_SAMPLE_FRAC} < r.rate AS sampled
  FROM sstr s JOIN sr r USING (stratum)
),
final AS (
  SELECT d.doc_id, lab.cluster_id,
         coalesce(d.drop_reason,
                  CASE WHEN lab.cluster_id <> d.doc_id THEN 'near_dup' END,
                  CASE WHEN ct.contaminated THEN 'contaminated' END,
                  CASE WHEN NOT sd.sampled THEN 'sampled_out' END) AS drop_reason,
         d.frac
  FROM decided d
  LEFT JOIN lab ON lab.doc_id = d.doc_id
  LEFT JOIN contam ct ON ct.doc_id = d.doc_id
  LEFT JOIN sdec sd ON sd.doc_id = d.doc_id
)
SELECT doc_id, cluster_id, drop_reason IS NULL AS kept, drop_reason,
       CASE WHEN drop_reason IS NULL THEN
         CASE WHEN frac < 0.9 THEN 'train' WHEN frac < 0.95 THEN 'val' ELSE 'test' END
       END AS split
FROM final"""

ORACLES["prep_split"] = """WITH h AS (
  SELECT doc_id,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split-v1'), 1, 8)))::BIGINT
           / 4294967296.0 AS frac
  FROM documents
)
SELECT doc_id, round(frac, 6) AS hash_frac,
       CASE WHEN frac < 0.9 THEN 'train'
            WHEN frac < 0.95 THEN 'val'
            ELSE 'test' END AS split
FROM h"""

ORACLES["prep_pack"] = f"""WITH base AS (
  SELECT doc_id,
         CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#pack-v1'), 1, 8)))::BIGINT % 8 AS INT) AS shard,
         CAST(len({_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         -- CAST: untyped DuckDB window sum() yields HUGEINT
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
  FROM base
)
SELECT doc_id, shard,
       CAST(cum // 512 AS INT) AS pack_id,
       CAST(cum % 512 AS INT) AS pack_offset,
       n_tokens
FROM c"""

ORACLES["prep_decontaminate"] = f"""WITH {_DOCS_CTE},
tok AS (SELECT doc_id, {_TOKS} AS w FROM docs),
dng AS (
  SELECT DISTINCT doc_id, ng
  FROM (SELECT doc_id, unnest({_NG8}) AS ng FROM tok WHERE len(w) >= 8)
),
etok AS (SELECT {_TOKS} AS w FROM documents WHERE doc_id % 50 = 0),
eng AS (
  SELECT DISTINCT ng
  FROM (SELECT unnest({_NG8}) AS ng FROM etok WHERE len(w) >= 8)
),
hits AS (SELECT doc_id, count(*) AS h FROM dng JOIN eng USING (ng) GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(h, 0) AS BIGINT) AS n_eval_ngrams,
       coalesce(h, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM docs) d LEFT JOIN hits USING (doc_id)"""

# (prep_decontaminate_neardup's oracle is defined after _SHINGLE_CTE /
# _LSH_CTES below — it reuses the dedup LSH banding fragments.)

# chunking: stride = 64 - 16 = 48, 1-based inclusive DuckDB slices

_SHINGLES2 = "[array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]"

_DSIR_B = "(('0x' || substr(md5(g || '#dsir-v1'), 1, 8)))::BIGINT % 256"

ORACLES["prep_dsir_weights"] = f"""WITH {_DOCS_CTE},
rt AS (SELECT doc_id, {_TOKS} AS w FROM docs),
rfe AS (
  SELECT doc_id, {_DSIR_B} AS b
  FROM (SELECT doc_id, unnest({_SHINGLES2}) AS g FROM rt)
),
et AS (SELECT doc_id, {_TOKS} AS w FROM documents WHERE doc_id % 50 = 0),
efe AS (
  SELECT doc_id, {_DSIR_B} AS b
  FROM (SELECT doc_id, unnest({_SHINGLES2}) AS g FROM et)
),
rc AS (SELECT b, count(*) AS c FROM rfe GROUP BY b),
tc AS (SELECT b, count(*) AS c FROM efe GROUP BY b),
tot AS (SELECT (SELECT count(*) FROM rfe) AS nr, (SELECT count(*) FROM efe) AS nt),
ratio AS (
  SELECT coalesce(rc.b, tc.b) AS b,
         CAST(round(1e6 * ( ln((coalesce(tc.c, 0) + 1.0) / (tot.nt + 256.0))
                          - ln((coalesce(rc.c, 0) + 1.0) / (tot.nr + 256.0)) ))
              AS BIGINT) AS r
  FROM rc FULL JOIN tc ON rc.b = tc.b CROSS JOIN tot
),
dfc AS (SELECT doc_id, b, count(*) AS c FROM rfe GROUP BY doc_id, b)
SELECT d.doc_id,
       CAST(coalesce(sum(dfc.c), 0) AS BIGINT) AS n_features,
       CAST(coalesce(sum(dfc.c * ratio.r), 0) AS BIGINT) AS log_weight_micro
FROM docs d
LEFT JOIN dfc ON d.doc_id = dfc.doc_id
LEFT JOIN ratio ON dfc.b = ratio.b
GROUP BY d.doc_id"""

ORACLES["prep_chunks"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
),
c AS (
  SELECT doc_id, w,
         unnest(range(0, 1 + CAST(ceil(greatest(len(w) - 64, 0) / 48.0) AS INT))) AS k
  FROM t
)
SELECT doc_id, CAST(k AS INT) AS chunk_idx,
       array_to_string(w[k*48 + 1 : k*48 + 64], ' ') AS chunk_text,
       CAST(len(w[k*48 + 1 : k*48 + 64]) AS INT) AS n_chunk_tokens
FROM c"""

ORACLES["prep_shuffle"] = """
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY md5(CAST(doc_id AS VARCHAR) || '#shuffle-v1'), doc_id
       ) AS BIGINT) AS shuffle_rank
FROM documents"""

# cluster-aware split: same recursive closure as dedup_clusters, split
# hash taken on the cluster id. Defined as a template here (the shared
# shingle/LSH CTE fragments are defined further down, next to the
# dedup oracles) and .format()-ed right after they are.
_SPLIT_BY_CLUSTER_TMPL = """WITH RECURSIVE {docs_cte},
{shingle_cte},
{lsh_ctes},
sym AS (
  SELECT doc_a AS u, doc_b AS v FROM cand
  UNION ALL SELECT doc_b, doc_a FROM cand
),
reach(node, comp) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT e.v, r.comp FROM reach r JOIN sym e ON e.u = r.node
),
lab AS (SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node)
SELECT doc_id, cluster_id,
       CASE WHEN frac < 0.9 THEN 'train'
            WHEN frac < 0.95 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, cluster_id,
             (('0x' || substr(md5(CAST(cluster_id AS VARCHAR) || '#split-v1'), 1, 8)))::BIGINT
               / 4294967296.0 AS frac
      FROM lab)"""

ORACLES["prep_sample_stratified"] = f"""WITH h AS (
  SELECT doc_id, source, {_SAMPLE_FRAC} AS frac,
         CAST(CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
              WHEN 'src2' THEN 0.25 ELSE 0.0 END AS DOUBLE) AS rate
  FROM documents
)
SELECT doc_id, source, round(frac, 6) AS hash_frac,
       round(rate, 6) AS rate, frac < rate AS sampled
FROM h"""

# same association order as the Spark side: ((w / sw) * (0.5 * total)) / n_s
ORACLES["prep_sample_temperature"] = f"""WITH s AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 6 THEN 'web'
              WHEN doc_id % 10 < 9 THEN 'books'
              ELSE 'code' END AS stratum
  FROM documents
),
c AS (SELECT stratum, count(*) AS n_s FROM s GROUP BY stratum),
w AS (SELECT stratum, n_s, pow(CAST(n_s AS DOUBLE), 0.5) AS w FROM c),
t AS (SELECT sum(w) AS sw, (SELECT CAST(count(*) AS DOUBLE) FROM s) AS total FROM w),
r AS (
  SELECT stratum,
         least(CAST(1.0 AS DOUBLE), ((w / t.sw) * (0.5 * t.total)) / n_s) AS rate
  FROM w, t
)
SELECT s.doc_id, s.stratum, round({_SAMPLE_FRAC}, 6) AS hash_frac,
       round(r.rate, 6) AS rate, {_SAMPLE_FRAC} < r.rate AS sampled
FROM s JOIN r USING (stratum)"""

ORACLES["dedup_exact"] = f"""WITH {_DOCS_CTE}
SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS canonical_id
FROM docs GROUP BY md5(text)"""

ORACLES["dedup_exact_flags"] = f"""WITH {_DOCS_CTE}
SELECT doc_id,
       row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1 AS is_duplicate
FROM docs"""

ORACLES["dedup_bloom_probe"] = f"""WITH {_DOCS_CTE},
hashed AS (SELECT doc_id, md5(text) AS content_hash FROM docs),
pos AS (
  SELECT h.doc_id, h.content_hash,
         ('0x' || substr(md5(h.content_hash || '#' || CAST(k.i AS VARCHAR)
            || '#bloom-v1'), 1, 8))::BIGINT % 262144 AS bitpos
  FROM hashed h CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) k
),
words AS (
  SELECT bitpos >> 6 AS block,
         bit_or(CASE WHEN bitpos % 64 = 63 THEN -9223372036854775808
                WHEN TRUE THEN 1::BIGINT << CAST(bitpos % 64 AS INT) END) AS word
  FROM pos WHERE doc_id < 100000 AND bitpos IS NOT NULL GROUP BY 1
),
probe AS (
  SELECT p.doc_id, p.content_hash,
         CASE WHEN (coalesce(w.word, 0)
                    & (CASE WHEN p.bitpos % 64 = 63 THEN -9223372036854775808
                       ELSE 1::BIGINT << CAST(p.bitpos % 64 AS INT) END)) <> 0
              THEN 1 ELSE 0 END AS hit
  FROM pos p LEFT JOIN words w ON (p.bitpos >> 6) = w.block
  WHERE p.doc_id >= 100000
)
SELECT doc_id,
       CASE WHEN max(content_hash) IS NULL THEN NULL
            ELSE sum(hit) = 4 END AS maybe_dup
FROM probe GROUP BY doc_id"""

_SHINGLE_CTE = f"""tok AS (
  SELECT doc_id, {_TOKS} AS w FROM docs
),
sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM tok)
)"""

_LSH_CTES = """base AS (
  SELECT doc_id, (('0x' || substr(md5(shingle || '#0'), 1, 8)))::BIGINT AS h0 FROM sh
),
sig AS (
  SELECT doc_id, i,
         min((h0 * (2*i + 3) + i * 2654435761) % 2147483647) AS minhash
  FROM base, range(0, 12) r(i)
  GROUP BY doc_id, i
),
banded AS (
  SELECT doc_id, CAST(i // 4 AS INT) AS band,
         md5(array_to_string(list(CAST(minhash AS VARCHAR) ORDER BY i), ',')) AS band_key
  FROM sig GROUP BY doc_id, CAST(i // 4 AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)"""

ORACLES["prep_split_by_cluster"] = _SPLIT_BY_CLUSTER_TMPL.format(
    docs_cte=_DOCS_CTE, shingle_cte=_SHINGLE_CTE, lsh_ctes=_LSH_CTES
)

ORACLES["prep_decontaminate_neardup"] = f"""WITH {_DOCS_CTE},
{_SHINGLE_CTE},
{_LSH_CTES},
ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
evtok AS (SELECT doc_id, {_TOKS} AS w FROM ev),
evsh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM evtok)
),
evbase AS (
  SELECT doc_id, (('0x' || substr(md5(shingle || '#0'), 1, 8)))::BIGINT AS h0 FROM evsh
),
evsig AS (
  SELECT doc_id, i,
         min((h0 * (2*i + 3) + i * 2654435761) % 2147483647) AS minhash
  FROM evbase, range(0, 12) r(i)
  GROUP BY doc_id, i
),
ekeys AS (
  SELECT DISTINCT CAST(i // 4 AS INT) AS band,
         md5(array_to_string(list(CAST(minhash AS VARCHAR) ORDER BY i), ',')) AS band_key
  FROM evsig GROUP BY doc_id, CAST(i // 4 AS INT)
),
hit AS (
  SELECT DISTINCT banded.doc_id
  FROM banded JOIN ekeys USING (band, band_key)
)
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM (SELECT doc_id FROM docs) d LEFT JOIN hit h USING (doc_id)"""

ORACLES["text_classifier"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
),
s AS (
  SELECT doc_id, len(w) AS n_tokens,
         CASE WHEN len(w) > 0 THEN
           list_sum(list_transform(w, x ->
             ((('0x' || substr(md5(x || '#clf-v1'), 1, 8))::BIGINT % 2001) - 1000)
               / 1000.0)) / len(w)
         ELSE 0.0 END AS mw
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(1.0 / (1.0 + exp(-mw)), 6) AS score,
       round(1.0 / (1.0 + exp(-mw)), 6) >= 0.5 AS label
FROM s"""

ORACLES["classifier_auc"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
),
sc AS (
  SELECT doc_id,
         CAST(coalesce(list_sum(list_transform(w, x ->
           ((('0x' || substr(md5(x || '#clf-v1'), 1, 8))::BIGINT % 2001) - 1000)
         )), 0) AS BIGINT) * 1000 AS a,
         CAST(len(w) AS BIGINT) AS n,
         list_contains(w, 'spark') AS label
  FROM t
),
scored AS (
  SELECT CASE WHEN n > 0
              THEN (a - ((a % n + n) % n)) // n
              ELSE 0 END AS s,
         label
  FROM sc
),
g AS (
  SELECT s,
         CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS neg
  FROM scored GROUP BY s
),
c AS (
  SELECT pos, neg,
         CAST(coalesce(sum(neg) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cumneg
  FROM g
),
tot AS (
  SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
         CAST(sum(neg) AS BIGINT) AS n_neg,
         CAST(sum(pos * (2 * cumneg + neg)) AS BIGINT) AS auc_num_x2
  FROM c
)
SELECT n_pos, n_neg, auc_num_x2,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         (auc_num_x2 * 1000000
          - ((auc_num_x2 * 1000000 % (2 * n_pos * n_neg) + 2 * n_pos * n_neg)
             % (2 * n_pos * n_neg)))
         // (2 * n_pos * n_neg) END AS auc_micro,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         round(CAST(auc_num_x2 AS DOUBLE) / (2 * n_pos * n_neg), 6)
       END AS auc
FROM tot"""

def _emb_comp_cte(dim: int) -> str:
    return f"""t AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
),
u AS (SELECT doc_id, unnest(w) AS tok FROM t),
comp AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok || '#emb-v1'), 1, 4))::BIGINT % {dim} AS bucket,
         1 - 2 * ((('0x' || substr(md5(tok || '#emb-v1'), 5, 1))::BIGINT) % 2)
           AS sgn
  FROM u
),
s AS (
  SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS val
  FROM comp GROUP BY doc_id, bucket HAVING sum(sgn) <> 0
)"""


ORACLES["embed_hash"] = f"""WITH {_emb_comp_cte(16)},
grid AS (
  SELECT d.doc_id, i.bucket
  FROM (SELECT doc_id FROM documents) d
  CROSS JOIN (SELECT unnest(range(16)) AS bucket) i
),
v AS (
  SELECT g.doc_id, g.bucket, coalesce(s.val, 0) AS val
  FROM grid g LEFT JOIN s USING (doc_id, bucket)
),
vec AS (
  SELECT doc_id, list(val ORDER BY bucket) AS vec FROM v GROUP BY doc_id
)
SELECT doc_id,
       CAST(len(list_filter(vec, x -> x <> 0)) AS BIGINT) AS nnz,
       CAST(list_sum(list_transform(vec, x -> x * x)) AS BIGINT) AS norm_sq,
       md5(array_to_string(list_transform(vec, x -> CAST(x AS VARCHAR)), ','))
         AS vec_md5
FROM vec"""

ORACLES["embed_hash_topk"] = f"""WITH {_emb_comp_cte(4096)},
p AS (
  SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id,
         CAST(sum(a.val * b.val) AS BIGINT) AS dot
  FROM s a JOIN s b ON a.bucket = b.bucket AND a.doc_id <> b.doc_id
  WHERE a.doc_id % 100 = 0
  GROUP BY a.doc_id, b.doc_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rank
  FROM p
)
SELECT query_id, neighbor_id, dot, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 1"""

ORACLES["text_vocab"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
),
u AS (SELECT doc_id, unnest(w) AS token FROM t)
SELECT token, count(*) AS tf, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM u GROUP BY token"""

ORACLES["text_top_ngrams"] = f"""WITH t AS (
  SELECT {_TOKS} AS w FROM documents
),
g AS (
  SELECT unnest([array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]) AS ngram
  FROM t WHERE len(w) >= 2
),
ga AS (SELECT ngram, count(*) AS count FROM g GROUP BY ngram)
SELECT ngram, count,
       CAST(row_number() OVER (ORDER BY count DESC, ngram) AS INT) AS rank
FROM ga QUALIFY rank <= 20"""

ORACLES["text_pair_lift"] = f"""WITH t AS (
  SELECT {_TOKS} AS w FROM documents
),
uni AS (SELECT unnest(w) AS token FROM t),
uc AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY token),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
pr AS (
  SELECT unnest([[w[i], w[i+1]] for i in range(1, len(w))]) AS p
  FROM t WHERE len(w) >= 2
),
pc AS (
  SELECT p[1] AS x, p[2] AS y, CAST(count(*) AS BIGINT) AS pair_count
  FROM pr GROUP BY 1, 2 HAVING count(*) >= 2
),
scored AS (
  SELECT pc.x, pc.y, pc.pair_count,
         ux.c AS x_count, uy.c AS y_count,
         CAST(((pc.pair_count * 1000000) // ux.c) * t.n // uy.c AS BIGINT)
           AS lift_micro
  FROM pc JOIN uc ux ON pc.x = ux.token
          JOIN uc uy ON pc.y = uy.token
          CROSS JOIN tot t
)
SELECT x, y, pair_count, x_count, y_count, lift_micro,
       CAST(row_number() OVER (ORDER BY lift_micro DESC, x, y) AS INT)
         AS rank
FROM scored QUALIFY rank <= 50"""

ORACLES["text_ngram_lm"] = f"""WITH t AS (
  SELECT {_TOKS} AS w FROM documents
),
g AS (
  SELECT unnest([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS ngram
  FROM t WHERE len(w) >= 3
),
ga AS (SELECT ngram, count(*) AS count FROM g GROUP BY ngram),
cc AS (
  -- MLE denominator: continuation mass, i.e. sum of the n-gram counts
  -- sharing the context (NOT raw (n-1)-gram occurrences, which include
  -- document-final positions with no continuation)
  SELECT array_to_string((string_split(ngram, ' '))[1:2], ' ') AS context,
         CAST(sum(count) AS BIGINT) AS context_count
  FROM ga GROUP BY 1
),
g2 AS (
  SELECT ngram, count,
         array_to_string((string_split(ngram, ' '))[1:2], ' ') AS context
  FROM ga WHERE count >= 2
)
SELECT g2.ngram, g2.count, cc.context_count,
       round(g2.count / cc.context_count, 6) AS cond_prob
FROM g2 JOIN cc USING (context)"""

ORACLES["text_lm_perplexity"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
),
g AS (
  SELECT doc_id, unnest({_SHINGLES3}) AS ngram
  FROM t WHERE len(w) >= 3
),
ga AS (SELECT ngram, count(*) AS count FROM g GROUP BY ngram),
cc AS (
  SELECT array_to_string((string_split(ngram, ' '))[1:2], ' ') AS context,
         CAST(sum(count) AS BIGINT) AS context_count
  FROM ga GROUP BY 1
),
lm AS (
  SELECT ga.ngram, round(ga.count / cc.context_count, 6) AS cond_prob
  FROM ga JOIN cc
    ON array_to_string((string_split(ga.ngram, ' '))[1:2], ' ') = cc.context
  WHERE ga.count >= 2
),
-- per-ngram cost quantized row-locally to integer micro-bits so the
-- per-doc sum is exact integer arithmetic (same contract as Spark)
sc AS (
  SELECT g.doc_id,
         CAST(round(-log2(greatest(coalesce(lm.cond_prob, 1e-6), 1e-6)) * 1e6)
              AS BIGINT) AS bm
  FROM g LEFT JOIN lm USING (ngram)
),
a AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
         CAST(sum(bm) AS BIGINT) AS bits_micro
  FROM sc GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(coalesce(a.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(a.bits_micro, 0) AS BIGINT) AS bits_micro,
       round(a.bits_micro / 1e6 / a.n_ngrams, 6) AS bits_per_ngram,
       round(pow(CAST(2 AS DOUBLE), a.bits_micro / 1e6 / a.n_ngrams), 4)
         AS perplexity
FROM t LEFT JOIN a USING (doc_id)"""

ORACLES["text_cms_counts"] = f"""WITH t AS (
  SELECT {_TOKS} AS w FROM documents
),
u AS (SELECT unnest(w) AS token FROM t),
cells AS (
  SELECT CAST(i AS INT) AS row_idx,
         (('0x' || substr(md5(token || '#' || CAST(i AS VARCHAR) || '#cms-v1'), 1, 8)))::BIGINT % 16 AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM u, range(0, 4) r(i) GROUP BY 1, 2
),
vocab AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt_exact FROM u GROUP BY token),
probe AS (
  SELECT v.token, v.cnt_exact, min(c.cnt) AS cnt_est
  FROM vocab v
  CROSS JOIN range(0, 4) r(i)
  JOIN cells c
    ON c.row_idx = CAST(i AS INT)
   AND c.bucket = (('0x' || substr(md5(v.token || '#' || CAST(i AS VARCHAR) || '#cms-v1'), 1, 8)))::BIGINT % 16
  GROUP BY 1, 2
)
SELECT token, cnt_exact, cnt_est,
       CAST(cnt_est - cnt_exact AS BIGINT) AS overcount
FROM probe"""

ORACLES["prep_sample_weighted"] = """WITH s AS (
  SELECT doc_id,
         CAST(greatest(1, n_chars) AS BIGINT) AS weight,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#wsample-v1'), 1, 8)))::BIGINT
           * 1048576 // CAST(greatest(1, n_chars) AS BIGINT) AS priority
  FROM documents
)
SELECT doc_id, weight, priority,
       CAST(row_number() OVER (ORDER BY priority, doc_id) AS INT) AS rank
FROM s QUALIFY rank <= 50"""

_SHINGLES2B = "[array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]"

def _clf_train_oracle_sql(iters=2, dim=16, lr_num=1, lr_den=2) -> str:
    """Unrolled-CTE replay of train_linear_classifier: one
    (margin, err, gradient, weight) CTE block per GD iteration.
    floor-div = (a - pmod(a,b)) // b (exact multiple, so DuckDB's
    truncating // is safe); hard sigmoid = clamped 500000 + (m >> 2)."""

    def fdiv(a, b):
        return f"((({a}) - (((({a}) % ({b})) + ({b})) % ({b}))) // ({b}))"

    ctes = [
        f"""t AS (
  SELECT doc_id, {_TOKS} AS w,
         CAST(CAST(list_contains({_TOKS}, 'spark') AS INT) AS BIGINT)
           * 1000000 AS y_u
  FROM documents
)""",
        "n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM t)",
        f"bk AS (SELECT CAST(unnest(range({dim + 1})) AS BIGINT) AS b)",
        f"""f AS (
  SELECT doc_id, y_u, b, CAST(count(*) AS BIGINT) AS x FROM (
    SELECT doc_id, y_u,
           unnest(list_append(
             [('0x' || substr(md5(tok || '#clf-train-v1'), 1, 4))::BIGINT
                % {dim} for tok in w],
             CAST({dim} AS BIGINT))) AS b
    FROM t)
  GROUP BY doc_id, y_u, b
)""",
        "w0 AS (SELECT b, CAST(0 AS BIGINT) AS wu FROM bk)",
    ]
    step = fdiv(f"{fdiv('g.gs', 'g.nd')} * {lr_num}", str(lr_den))
    for k in range(1, iters + 1):
        p = k - 1
        ctes += [
            f"""m{k} AS (
  SELECT f.doc_id, CAST(sum(w.wu * f.x) AS BIGINT) AS m
  FROM f JOIN w{p} w USING (b) GROUP BY f.doc_id
)""",
            f"""e{k} AS (
  SELECT t.doc_id,
         greatest(CAST(0 AS BIGINT), least(CAST(1000000 AS BIGINT),
                  500000 + (m{k}.m >> 2))) - t.y_u AS e
  FROM t JOIN m{k} USING (doc_id)
)""",
            f"""g{k} AS (
  SELECT f.b, CAST(sum(f.x * e{k}.e) AS BIGINT) AS gs, max(n.nd) AS nd
  FROM f JOIN e{k} USING (doc_id) CROSS JOIN n GROUP BY f.b
)""",
            f"""w{k} AS (
  SELECT w{p}.b, CAST(w{p}.wu - coalesce({step}, 0) AS BIGINT) AS wu
  FROM w{p} LEFT JOIN g{k} g ON g.b = w{p}.b
)""",
        ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT b AS bucket, wu AS weight_micro, wu / 1000000.0 AS weight FROM w{iters}"""
    )


ORACLES["text_classifier_train"] = _clf_train_oracle_sql()

ORACLES["text_lm_backoff"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
),
u AS (SELECT unnest(w) AS tok FROM t),
uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c1 FROM u GROUP BY tok),
tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n_total FROM uni),
bi AS (
  SELECT g, CAST(count(*) AS BIGINT) AS c2
  FROM (SELECT unnest({_SHINGLES2B}) AS g FROM t WHERE len(w) >= 2)
  GROUP BY g HAVING count(*) >= 2
),
tri AS (
  SELECT g, CAST(count(*) AS BIGINT) AS c3
  FROM (SELECT unnest({_SHINGLES3}) AS g FROM t WHERE len(w) >= 3)
  GROUP BY g HAVING count(*) >= 2
),
pos AS (
  SELECT doc_id, ngram,
         array_to_string((string_split(ngram, ' '))[1:2], ' ') AS ctx,
         array_to_string((string_split(ngram, ' '))[2:3], ' ') AS suf,
         (string_split(ngram, ' '))[2] AS w2,
         (string_split(ngram, ' '))[3] AS w3
  FROM (SELECT doc_id, unnest({_SHINGLES3}) AS ngram FROM t WHERE len(w) >= 3)
),
j AS (
  SELECT p.doc_id, tri.c3, bc.c2 AS c_ctx, bs.c2 AS c_suf,
         u2.c1 AS c_w2, u3.c1 AS c_w3, tot.n_total
  FROM pos p
  LEFT JOIN tri ON tri.g = p.ngram
  LEFT JOIN bi bc ON bc.g = p.ctx
  LEFT JOIN bi bs ON bs.g = p.suf
  LEFT JOIN uni u2 ON u2.tok = p.w2
  LEFT JOIN uni u3 ON u3.tok = p.w3
  CROSS JOIN tot
),
sc AS (
  SELECT doc_id,
         CASE WHEN c3 IS NOT NULL THEN 'tri'
              WHEN c_suf IS NOT NULL THEN 'bi'
              ELSE 'uni' END AS tier,
         CAST(round(-log2(greatest(
           CASE WHEN c3 IS NOT NULL THEN c3 / c_ctx
                WHEN c_suf IS NOT NULL THEN 0.4 * c_suf / c_w2
                ELSE 0.4 * 0.4 * coalesce(c_w3, 0) / n_total END,
           1e-9)) * 1e6) AS BIGINT) AS bm
  FROM j
),
a AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
         CAST(sum(CASE WHEN tier = 'tri' THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
         CAST(sum(CASE WHEN tier = 'bi' THEN 1 ELSE 0 END) AS BIGINT) AS n_bi,
         CAST(sum(CASE WHEN tier = 'uni' THEN 1 ELSE 0 END) AS BIGINT) AS n_uni,
         CAST(sum(bm) AS BIGINT) AS bits_micro
  FROM sc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(a.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(coalesce(a.n_bi, 0) AS BIGINT) AS n_bi,
       CAST(coalesce(a.n_uni, 0) AS BIGINT) AS n_uni,
       CAST(coalesce(a.bits_micro, 0) AS BIGINT) AS bits_micro
FROM documents d LEFT JOIN a USING (doc_id)"""

ORACLES["text_ppl_buckets"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
),
g AS (
  SELECT doc_id, unnest({_SHINGLES3}) AS ngram
  FROM t WHERE len(w) >= 3
),
ga AS (SELECT ngram, count(*) AS count FROM g GROUP BY ngram),
cc AS (
  SELECT array_to_string((string_split(ngram, ' '))[1:2], ' ') AS context,
         CAST(sum(count) AS BIGINT) AS context_count
  FROM ga GROUP BY 1
),
lm AS (
  SELECT ga.ngram, round(ga.count / cc.context_count, 6) AS cond_prob
  FROM ga JOIN cc
    ON array_to_string((string_split(ga.ngram, ' '))[1:2], ' ') = cc.context
  WHERE ga.count >= 2
),
sc AS (
  SELECT g.doc_id,
         CAST(round(-log2(greatest(coalesce(lm.cond_prob, 1e-6), 1e-6)) * 1e6)
              AS BIGINT) AS bm
  FROM g LEFT JOIN lm USING (ngram)
),
a AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
         CAST(sum(bm) AS BIGINT) AS bits_micro
  FROM sc GROUP BY doc_id
),
-- integer micro-bits per ngram, binned: width = 20e6 // 64 = 312500
bb AS (
  SELECT d.doc_id, d.source,
         CAST(coalesce(a.n_ngrams, 0) AS BIGINT) AS n_ngrams,
         CASE WHEN a.n_ngrams > 0
              THEN CAST(a.bits_micro // a.n_ngrams AS BIGINT) END AS mb_per_ngram,
         CASE WHEN a.n_ngrams > 0
              THEN CAST(least(63, (a.bits_micro // a.n_ngrams) // 312500) AS INT)
         END AS ppl_bin
  FROM documents d LEFT JOIN a USING (doc_id)
),
hist AS (
  SELECT source, ppl_bin, count(*) AS n
  FROM bb WHERE ppl_bin IS NOT NULL GROUP BY 1, 2
),
c AS (
  SELECT source, ppl_bin,
         sum(n) OVER (PARTITION BY source ORDER BY ppl_bin) AS cum,
         sum(n) OVER (PARTITION BY source) AS tot
  FROM hist
),
cuts AS (
  SELECT source,
         min(CASE WHEN 3 * cum >= tot THEN ppl_bin END) AS c1,
         min(CASE WHEN 3 * cum >= 2 * tot THEN ppl_bin END) AS c2
  FROM c GROUP BY source
)
SELECT bb.doc_id, bb.source, bb.n_ngrams, bb.mb_per_ngram, bb.ppl_bin,
       CASE WHEN bb.ppl_bin IS NULL THEN 'unscored'
            WHEN bb.ppl_bin <= cuts.c1 THEN 'head'
            WHEN bb.ppl_bin <= cuts.c2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM bb LEFT JOIN cuts USING (source)"""

ORACLES["text_bpe_pairs"] = f"""WITH t AS (
  SELECT {_TOKS} AS toks FROM documents
),
words AS (
  SELECT word, count(*) AS wc
  FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word
),
p AS (
  SELECT unnest([substr(word, i, 1) || ' ' || substr(word, i + 1, 1)
                 for i in range(1, len(word))]) AS pair,
         wc
  FROM words WHERE len(word) >= 2
)
SELECT pair, CAST(sum(wc) AS BIGINT) AS count
FROM p GROUP BY pair HAVING sum(wc) >= 2"""

# BPE train/encode oracles share the sentinel-wrapped symbol encoding
# with functions/textstats.py (see the note there): "<t><h><e>", merge
# (l, r) = literal replace '<l><r>' -> '<lr>' (DuckDB replace() is
# left-to-right non-overlapping = greedy BPE, boundary-safe because
# tokens are [a-z0-9]+ only).
_BPE_WRAP = (
    "'<' || array_to_string([word[i] for i in range(1, len(word) + 1)],"
    " '><') || '>'"
)


def _bpe_train_oracle(n_merges: int) -> str:
    ctes = [
        f"t AS (SELECT {_TOKS} AS toks FROM documents)",
        f"""v0 AS (
  SELECT {_BPE_WRAP} AS seq, count(*) AS wc
  FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word
)""",
    ]
    for r in range(1, n_merges + 1):
        ctes.append(f"""p{r} AS (
  SELECT pair, CAST(sum(wc) AS BIGINT) AS c
  FROM (
    SELECT wc,
           unnest([syms[i] || ' ' || syms[i + 1]
                   for i in range(1, len(syms))]) AS pair
    FROM (SELECT wc, string_split(trim(seq, '<>'), '><') AS syms
          FROM v{r - 1})
  ) GROUP BY pair
)""")
        ctes.append(
            f"b{r} AS (SELECT split_part(pair, ' ', 1) AS l,"
            f" split_part(pair, ' ', 2) AS r, c"
            f" FROM p{r} ORDER BY c DESC, pair LIMIT 1)"
        )
        ctes.append(f"""v{r} AS (
  SELECT wc, replace(seq,
    '<' || (SELECT l FROM b{r}) || '><' || (SELECT r FROM b{r}) || '>',
    '<' || (SELECT l FROM b{r}) || (SELECT r FROM b{r}) || '>') AS seq
  FROM v{r - 1}
)""")
    finals = [
        f"SELECT CAST({r} AS INTEGER) AS rank, l AS left_sym,"
        f" r AS right_sym, l || r AS merged, c AS pair_count FROM b{r}"
        for r in range(1, n_merges + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(finals)


ORACLES["text_bpe_train"] = _bpe_train_oracle(3)

_BPE_ENC = "'<' || array_to_string([w[i] for i in range(1, len(w) + 1)], '><') || '>'"
for _l, _r in BPE_FIXTURE_MERGES:
    _BPE_ENC = f"replace({_BPE_ENC}, '<{_l}><{_r}>', '<{_l}{_r}>')"

ORACLES["text_bpe_encode"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
s AS (
  SELECT doc_id, len(toks) AS nt,
         flatten(list_transform(
           list_transform(toks, w -> {_BPE_ENC}),
           q -> string_split(trim(q, '<>'), '><'))) AS sw
  FROM t
)
SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
       CAST(len(sw) AS BIGINT) AS n_bpe_tokens,
       array_to_string(sw, ' ') AS bpe_text
FROM s"""

def _bm25_oracle(k: int = 5, k1: float = 1.2, b: float = 0.75) -> str:
    import re as _re

    qvals = ",\n         ".join(
        f"('{qid}', '{t}')"
        for qid, qtext in BM25_QUERIES
        for t in sorted(set(_re.split(r"[^a-z0-9]+", qtext.lower())) - {""})
    )
    terms = sorted(
        {
            t
            for _, qtext in BM25_QUERIES
            for t in _re.split(r"[^a-z0-9]+", qtext.lower())
            if t
        }
    )
    in_list = ", ".join(f"'{t}'" for t in terms)
    # constant forms mirror the Spark expression exactly (k1+1 and 1-b
    # folded the same way) so both engines evaluate the identical
    # double-precision formula before micro-quantization
    return f"""WITH d AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks FROM d),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, sum(dl) AS sum_dl FROM dl
),
q(query_id, term) AS (
  VALUES {qvals}
),
posts AS (
  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl)
  WHERE term IN ({in_list})
  GROUP BY doc_id, dl, term
),
idf AS (
  SELECT term,
         ln((n_docs - cnt + 0.5) / (cnt + 0.5) + 1.0) AS idf,
         sum_dl / n_docs AS avgdl
  FROM (SELECT term, CAST(count(*) AS DOUBLE) AS cnt
        FROM posts GROUP BY term), stats
),
contrib AS (
  SELECT q.query_id, p.doc_id,
         CAST(round(i.idf * (p.tf * {k1 + 1.0})
             / (p.tf + {k1} * ({1.0 - b} + {b} * p.dl / i.avgdl))
             * 1e6) AS BIGINT) AS c
  FROM posts p JOIN idf i USING (term) JOIN q USING (term)
),
scored AS (
  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
  FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score_micro,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY score_micro DESC, doc_id) AS INTEGER) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= {k}"""


ORACLES["text_bm25_topk"] = _bm25_oracle(5)
# index-served path must reproduce the direct scan exactly
ORACLES["text_bm25_indexed"] = _bm25_oracle(5)

# Two-stage rerank oracle: the BM25 top-20 oracle as a derived table,
# then the fake cross-encoder score (md5-arithmetic shared verbatim
# with functions/rerank.py: fake_ce_score, salt 'ce-v1', chr(31)
# separators), ranked on the exact double, rounded for output.
_RERANK_QT = ",\n    ".join(
    f"('{qid}', '{qtext}')" for qid, qtext in BM25_QUERIES
)
def _bm25_chunk_oracle(k: int, k1: float = 1.2, b: float = 0.75) -> str:
    """The _bm25_oracle construction re-based onto the chunk table
    (chunk_uid = doc_id*1000 + chunk_idx, 64-token windows, stride
    48) — the whole-chain oracle for retrieval_topk."""
    import re as _re

    qvals = ",\n         ".join(
        f"('{qid}', '{t}')"
        for qid, qtext in BM25_QUERIES
        for t in sorted(set(_re.split(r"[^a-z0-9]+", qtext.lower())) - {""})
    )
    terms = sorted(
        {
            t
            for _, qtext in BM25_QUERIES
            for t in _re.split(r"[^a-z0-9]+", qtext.lower())
            if t
        }
    )
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""tt AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
),
c0 AS (
  SELECT doc_id, w,
         unnest(range(0, 1 + CAST(ceil(greatest(len(w) - 64, 0) / 48.0) AS INT))) AS k
  FROM tt
),
chunks AS (
  SELECT doc_id * 1000 + k AS chunk_uid,
         array_to_string(w[k*48 + 1 : k*48 + 64], ' ') AS chunk_text
  FROM c0
),
d AS (
  SELECT chunk_uid, chunk_text,
         list_filter(string_split_regex(lower(chunk_text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM chunks
),
dl AS (SELECT chunk_uid, chunk_text, CAST(len(toks) AS DOUBLE) AS dl, toks FROM d),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, sum(dl) AS sum_dl FROM dl
),
q(query_id, term) AS (
  VALUES {qvals}
),
posts AS (
  SELECT chunk_uid, dl, term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT chunk_uid, dl, unnest(toks) AS term FROM dl)
  WHERE term IN ({in_list})
  GROUP BY chunk_uid, dl, term
),
idf AS (
  SELECT term,
         ln((n_docs - cnt + 0.5) / (cnt + 0.5) + 1.0) AS idf,
         sum_dl / n_docs AS avgdl
  FROM (SELECT term, CAST(count(*) AS DOUBLE) AS cnt
        FROM posts GROUP BY term), stats
),
contrib AS (
  SELECT q.query_id, p.chunk_uid,
         CAST(round(i.idf * (p.tf * {k1 + 1.0})
             / (p.tf + {k1} * ({1.0 - b} + {b} * p.dl / i.avgdl))
             * 1e6) AS BIGINT) AS c
  FROM posts p JOIN idf i USING (term) JOIN q USING (term)
),
scored AS (
  SELECT query_id, chunk_uid, CAST(sum(c) AS BIGINT) AS score_micro
  FROM contrib GROUP BY query_id, chunk_uid
),
recall AS (
  SELECT query_id, chunk_uid
  FROM (SELECT query_id, chunk_uid,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score_micro DESC, chunk_uid) AS rnk
        FROM scored)
  WHERE rnk <= {k}
),
cands AS (
  SELECT r.query_id, r.chunk_uid, c.chunk_text
  FROM recall r JOIN chunks c USING (chunk_uid)
)"""


ORACLES["text_rerank_topk"] = f"""WITH
qt(query_id, query_text) AS (VALUES
    {_RERANK_QT}),
cands AS (SELECT query_id, doc_id FROM ({_bm25_oracle(20)}) b),
scored AS (
  SELECT c.query_id, c.doc_id,
         (('0x' || substr(md5(q.query_text || chr(31) || d.text
                              || chr(31) || 'ce-v1'), 1, 8))::BIGINT)
           / 4294967296.0 AS ce
  FROM cands c
  JOIN documents d USING (doc_id)
  JOIN qt q USING (query_id)
  WHERE d.text IS NOT NULL
),
ranked AS (
  SELECT query_id, doc_id, round(ce, 6) AS ce_score,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY ce DESC, doc_id) AS INTEGER) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 5"""

# Whole-chain retrieval oracle: chunking -> chunk-grained BM25 recall
# (top-20) -> fake cross-encoder over (query, chunk_text) -> top-5,
# mirroring plans/retrieval.py's lazy chain in retrieval_topk.
ORACLES["retrieval_topk"] = f"""WITH {_bm25_chunk_oracle(20)},
qt(query_id, query_text) AS (VALUES
    {_RERANK_QT}),
scored2 AS (
  SELECT c.query_id, c.chunk_uid,
         (('0x' || substr(md5(q.query_text || chr(31) || c.chunk_text
                              || chr(31) || 'ce-v1'), 1, 8))::BIGINT)
           / 4294967296.0 AS ce
  FROM cands c
  JOIN qt q USING (query_id)
  WHERE c.chunk_text IS NOT NULL
),
ranked2 AS (
  SELECT query_id, chunk_uid, round(ce, 6) AS ce_score,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY ce DESC, chunk_uid) AS INTEGER) AS rank
  FROM scored2
)
SELECT * FROM ranked2 WHERE rank <= 5"""

ORACLES["prep_cap_per_group"] = """WITH r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
)
SELECT doc_id, source, n_chars,
       CASE WHEN rn <= 10 THEN CAST(rn AS BIGINT) END AS rank,
       rn <= 10 AS kept
FROM r"""

ORACLES["prep_mix_corpus"] = f"""WITH rows_t AS (
  SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
),
avail AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail FROM rows_t GROUP BY source
),
rated AS (
  SELECT r.doc_id, r.source, r.n_tokens,
         CASE WHEN a.avail > 0 THEN
           CAST(4000 AS DOUBLE) * (CASE r.source
             WHEN 'src0' THEN CAST(0.4 AS DOUBLE)
             WHEN 'src1' THEN CAST(0.3 AS DOUBLE)
             WHEN 'src2' THEN CAST(0.2 AS DOUBLE)
             WHEN 'src3' THEN CAST(0.1 AS DOUBLE)
             ELSE CAST(0 AS DOUBLE) END) / a.avail
         ELSE CAST(0 AS DOUBLE) END AS rate
  FROM rows_t r LEFT JOIN avail a USING (source)
)
SELECT doc_id, source, n_tokens, round(rate, 6) AS rate,
       CAST(floor(rate) AS BIGINT)
         + CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix-v1'), 1, 8))::BIGINT
                        / 4294967296.0) < (rate - floor(rate))
                THEN 1 ELSE 0 END AS n_copies
FROM rated"""

ORACLES["dedup_lines"] = f"""WITH {_DOCS_CTE},
t AS (SELECT doc_id, {_TOKS} AS w FROM docs),
ln AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(len(w) / 10.0) AS INT))) AS pos,
         w
  FROM t WHERE len(w) > 0
),
lines AS (
  SELECT doc_id, CAST(pos AS INT) AS pos,
         array_to_string(w[pos * 10 + 1 : pos * 10 + 10], ' ') AS line
  FROM ln
),
cnt AS (SELECT line, count(*) AS c FROM lines GROUP BY line),
j AS (SELECT l.doc_id, l.pos, l.line, c.c FROM lines l JOIN cnt c USING (line))
SELECT doc_id,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN c > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_dropped,
       coalesce(string_agg(CASE WHEN c <= 2 THEN line END, ' ' ORDER BY pos), '')
         AS text_kept
FROM j GROUP BY doc_id
UNION ALL
-- zero-token docs still appear (Spark: posexplode_outer)
SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), ''
FROM t WHERE len(w) = 0"""


ORACLES["dedup_exact_substr"] = f"""WITH {_DOCS_CTE},
t AS (SELECT doc_id, {_TOKS} AS w FROM docs),
g0 AS (
  SELECT doc_id, CAST(unnest(range(1, len(w) - 6)) AS INT) AS pos, w
  FROM t WHERE len(w) >= 8
),
grams AS (SELECT doc_id, pos, array_to_string(w[pos:pos+7], ' ') AS g FROM g0),
dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
dup AS (SELECT doc_id, pos FROM grams JOIN dupg USING (g)),
dstat AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams FROM dup GROUP BY doc_id),
cov AS (SELECT DISTINCT doc_id, pos + CAST(j AS INT) AS p FROM dup, range(0, 8) r(j)),
cstat AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens_removed FROM cov GROUP BY doc_id),
tok AS (
  SELECT doc_id, CAST(unnest(range(1, len(w) + 1)) AS INT) AS p, w
  FROM t WHERE len(w) > 0
),
kept AS (
  SELECT tk.doc_id,
         coalesce(string_agg(CASE WHEN c.p IS NULL THEN tk.w[tk.p] END,
                             ' ' ORDER BY tk.p), '') AS text_kept
  FROM tok tk LEFT JOIN cov c ON tk.doc_id = c.doc_id AND tk.p = c.p
  GROUP BY tk.doc_id
)
SELECT t.doc_id,
       CAST(len(t.w) AS BIGINT) AS n_tokens,
       coalesce(ds.n_dup_grams, 0) AS n_dup_grams,
       coalesce(cs.n_tokens_removed, 0) AS n_tokens_removed,
       coalesce(k.text_kept, '') AS text_kept
FROM t
LEFT JOIN dstat ds USING (doc_id)
LEFT JOIN cstat cs USING (doc_id)
LEFT JOIN kept k USING (doc_id)"""

ORACLES["dedup_minhash_lsh"] = f"""WITH {_DOCS_CTE},
{_SHINGLE_CTE},
{_LSH_CTES}
SELECT doc_a, doc_b FROM cand"""

ORACLES["dedup_simhash"] = f"""WITH {_DOCS_CTE},
tok AS (
  SELECT doc_id, unnest({_TOKS}) AS shingle FROM docs
),
hashed AS (
  SELECT doc_id, (('0x' || substr(md5(shingle || '#0'), 1, 8)))::BIGINT AS h FROM tok
),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashed, range(0, 32) r(b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       -- CAST: untyped DuckDB sum() yields HUGEINT; Spark emits BIGINT
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
UNION ALL
-- zero-token docs: no unnest rows, simhash 0 (Spark: explode_outer)
SELECT doc_id, CAST(0 AS BIGINT) FROM docs WHERE len({_TOKS}) = 0"""

ORACLES["dedup_ngram_jaccard"] = f"""WITH {_DOCS_CTE},
{_SHINGLE_CTE},
{_LSH_CTES},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT inter.doc_a, inter.doc_b,
       round(i / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN cand ON cand.doc_a = inter.doc_a AND cand.doc_b = inter.doc_b
JOIN sizes sa ON sa.doc_id = inter.doc_a
JOIN sizes sb ON sb.doc_id = inter.doc_b
WHERE i / (sa.sz + sb.sz - i) >= 0.5"""

# transitive closure by min-label reachability: DuckDB's recursive
# UNION dedups (node, comp) rows, so the fixpoint is the full set of
# (node, reachable-id) pairs and min(comp) is the component minimum —
# an independent construction from the repo's large-star/small-star.
ORACLES["dedup_clusters"] = f"""WITH RECURSIVE {_DOCS_CTE},
{_SHINGLE_CTE},
{_LSH_CTES},
sym AS (
  SELECT doc_a AS u, doc_b AS v FROM cand
  UNION ALL SELECT doc_b, doc_a FROM cand
),
reach(node, comp) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT e.v, r.comp FROM reach r JOIN sym e ON e.u = r.node
),
lab AS (SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node),
sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id)
SELECT l.doc_id, l.cluster_id, sz.cluster_size,
       l.doc_id = l.cluster_id AS is_canonical
FROM lab l JOIN sz USING (cluster_id)"""

ORACLES["dedup_survivors"] = f"""WITH RECURSIVE {_DOCS_CTE},
{_SHINGLE_CTE},
{_LSH_CTES},
sym AS (
  SELECT doc_a AS u, doc_b AS v FROM cand
  UNION ALL SELECT doc_b, doc_a FROM cand
),
reach(node, comp) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT e.v, r.comp FROM reach r JOIN sym e ON e.u = r.node
),
lab AS (SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node),
jq AS (
  SELECT lab.doc_id, lab.cluster_id,
         CAST(length(d.text) AS BIGINT) AS quality
  FROM lab JOIN docs d USING (doc_id)
),
best AS (SELECT cluster_id, max(quality) AS bq FROM jq GROUP BY cluster_id),
bid AS (
  SELECT jq.cluster_id, min(jq.doc_id) AS keep_id
  FROM jq JOIN best ON jq.cluster_id = best.cluster_id
                   AND jq.quality = best.bq
  GROUP BY jq.cluster_id
)
SELECT jq.doc_id, jq.cluster_id, jq.quality,
       jq.doc_id = bid.keep_id AS keep
FROM jq JOIN bid USING (cluster_id)"""

_URL_FIXTURE = """
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END)
    || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
    || 'Site' || CAST(doc_id % 50 AS VARCHAR) || '.Example.COM'
    || '/page/' || CAST(doc_id % 100 AS VARCHAR)
    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&id=7&utm_medium=x'
             WHEN doc_id % 5 = 1 THEN '?id=7' ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END) AS url
  FROM documents"""

_URL_NORM_CTES = f"""u AS ({_URL_FIXTURE}
), n AS (
  SELECT doc_id, url,
    regexp_replace(regexp_replace(url, '#.*$', ''),
                   '^([A-Za-z][A-Za-z0-9+.-]*:)?//', '') AS ns
  FROM u
), p AS (
  SELECT doc_id, url, ns,
    regexp_extract(ns, '^[^/?]+') AS host_raw,
    substr(ns, length(regexp_extract(ns, '^[^/?]+')) + 1) AS rest
  FROM n
), m AS (
  SELECT doc_id, url,
    regexp_replace(lower(host_raw), '^www\\.', '') AS host,
    regexp_replace(regexp_replace(rest, '\\?.*$', ''), '/+$', '') AS path,
    list_sort(list_filter(
      string_split(regexp_extract(rest, '\\?(.*)$', 1), '&'),
      x -> x <> '' AND NOT starts_with(x, 'utm_'))) AS params
  FROM p
), normed AS (
  SELECT doc_id, url,
    host || path
    || (CASE WHEN len(params) > 0
             THEN '?' || array_to_string(params, '&') ELSE '' END) AS norm_url,
    regexp_extract(host, '[^.]+\\.[^.]+$') AS domain
  FROM m
)"""

ORACLES["prep_url_normalize"] = f"""WITH {_URL_NORM_CTES}
SELECT doc_id, url, norm_url, domain FROM normed"""

ORACLES["prep_url_dedup"] = f"""WITH {_URL_NORM_CTES},
canon AS (
  SELECT norm_url, min(doc_id) AS canon_id,
         CAST(count(*) AS BIGINT) AS n_copies
  FROM normed GROUP BY norm_url
)
SELECT n.doc_id, n.norm_url, n.domain, c.n_copies,
       n.doc_id <> c.canon_id AS is_duplicate
FROM normed n JOIN canon c USING (norm_url)"""

ORACLES["text_token_count"] = f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subwords_est,
       len(list_distinct({_TOKS})) AS n_unique_tokens
FROM documents"""


ORACLES["text_quality"] = f"""WITH t AS (
  SELECT doc_id, text, {_TOKS} AS w,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS n_punct
  FROM documents
), m AS (
  SELECT doc_id, n_chars, n_punct,
         len(w) AS n_tokens,
         len(list_filter(w, x -> list_contains({_EN}, x))) AS stop,
         len(list_distinct(w)) AS uniq
  FROM t
)
SELECT doc_id, n_chars, n_tokens,
       round(n_punct / greatest(n_chars, 1), 4) AS punct_ratio,
       round(stop / greatest(n_tokens, 1), 4) AS stopword_ratio,
       round(uniq / greatest(n_tokens, 1), 4) AS unique_ratio,
       round(least(n_tokens / 100.0, 1.0) * 0.4
             + (stop / greatest(n_tokens, 1)) * 0.3
             + (uniq / greatest(n_tokens, 1)) * 0.3, 4) AS quality
FROM m"""

_GOPHER_SEED = "text" + "".join(
    f" || CASE WHEN doc_id % {m} = 0 THEN '{tail}' ELSE '' END"
    for m, tail in _GOPHER_MODS
)
_GW = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"
_GL = "string_split(text, chr(10))"

ORACLES["text_gopher_rules"] = f"""WITH s AS (
  SELECT doc_id, {_GOPHER_SEED} AS text FROM documents
), m AS (
  SELECT doc_id,
    CAST(len({_GW}) AS BIGINT) AS n_words,
    CAST(len({_GL}) AS BIGINT) AS n_lines,
    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS word_chars,
    CAST(len(list_filter({_GW}, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
    CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_ell,
    CAST(len(list_filter({_GL}, l -> l LIKE '- %' OR l LIKE '* %')) AS BIGINT) AS n_bullet,
    CAST(len(list_filter({_GL}, l -> l LIKE '%...')) AS BIGINT) AS n_ell_lines,
    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
                         st -> list_contains({_TOKS}, st))) AS BIGINT) AS n_stops
  FROM s
)
SELECT doc_id, n_words, n_lines,
       n_words >= 50 AND n_words <= 100000 AS ok_word_count,
       3 * n_words <= word_chars AND word_chars <= 10 * n_words AS ok_mean_word_len,
       10 * (n_hash + n_ell) <= n_words AS ok_symbol_ratio,
       10 * n_bullet <= 9 * n_lines AS ok_bullet_lines,
       10 * n_ell_lines <= 3 * n_lines AS ok_ellipsis_lines,
       5 * n_alpha >= 4 * n_words AS ok_alpha_words,
       n_stops >= 2 AS ok_stopwords,
       (n_words >= 50 AND n_words <= 100000)
       AND (3 * n_words <= word_chars AND word_chars <= 10 * n_words)
       AND (10 * (n_hash + n_ell) <= n_words)
       AND (10 * n_bullet <= 9 * n_lines)
       AND (10 * n_ell_lines <= 3 * n_lines)
       AND (5 * n_alpha >= 4 * n_words)
       AND (n_stops >= 2) AS keep
FROM m"""

ORACLES["text_normalize"] = f"""WITH s AS (
  SELECT doc_id,
         CASE WHEN doc_id % 9 = 0 THEN text || '{NORM_TAIL}' ELSE text END AS text
  FROM documents
), n AS (
  SELECT doc_id,
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          translate(lower(text),
                    'áàâäãåéèêëíìîïóòôöõúùûüýÿñç',
                    'aaaaaaeeeeiiiiooooouuuuyync'),
          '[0-9]', '0', 'g'),
        '[^a-z0-9 \t\n]', ' ', 'g'),
      '\\s+', ' ', 'g')) AS norm_text
  FROM s
)
SELECT doc_id, norm_text, md5(norm_text) AS norm_hash FROM n"""

ORACLES["text_langid"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
), c AS (
  SELECT doc_id,
         len(list_filter(w, x -> list_contains({_EN}, x))) AS n_en,
         len(list_filter(w, x -> list_contains({_DE}, x))) AS n_de,
         len(list_filter(w, x -> list_contains({_ES}, x))) AS n_es,
         len(list_filter(w, x -> list_contains({_FR}, x))) AS n_fr
  FROM t
)
SELECT doc_id, n_en, n_de, n_es, n_fr,
       CASE WHEN n_en >= n_de AND n_en >= n_es AND n_en >= n_fr THEN 'en'
            WHEN n_de >= n_es AND n_de >= n_fr THEN 'de'
            WHEN n_es >= n_fr THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM c"""

ORACLES["text_fingerprint"] = f"""
SELECT doc_id,
       md5(text) AS content_hash,
       md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS token_set_hash
FROM documents"""

ORACLES["text_subwords"] = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS BIGINT)
         AS n_pieces,
       coalesce(CAST(list_sum(list_transform(
           regexp_extract_all(text, '[A-Za-z]+'),
           x -> CAST(ceil(length(x) / 4.0) AS BIGINT) - 1)) AS BIGINT), 0)
         AS n_merge_excess,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS BIGINT)
         + coalesce(CAST(list_sum(list_transform(
             regexp_extract_all(text, '[A-Za-z]+'),
             x -> CAST(ceil(length(x) / 4.0) AS BIGINT) - 1)) AS BIGINT), 0)
         AS n_subwords_bpe
FROM documents"""

ORACLES["dedup_jaccard_est"] = f"""WITH {_DOCS_CTE},
{_SHINGLE_CTE},
{_LSH_CTES}
SELECT c.doc_a, c.doc_b,
       round(CAST(sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
                  AS DOUBLE) / 12.0, 6) AS jaccard_est
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
GROUP BY c.doc_a, c.doc_b"""

_QUALITY_EXPR = f"""round(least(len({_TOKS}) / 100.0, 1.0) * 0.4
    + (len(list_filter({_TOKS}, x -> list_contains({_EN}, x)))
       / greatest(len({_TOKS}), 1)) * 0.3
    + (len(list_distinct({_TOKS})) / greatest(len({_TOKS}), 1)) * 0.3, 4)"""

ORACLES["text_quality_histogram"] = f"""WITH t AS (
  SELECT doc_id, source, {_QUALITY_EXPR} AS quality FROM documents
),
h AS (
  SELECT source,
         LEAST(19, GREATEST(0, CAST(floor((quality - 0.0) / 0.05) AS INT)))
           AS bin,
         count(*) AS n
  FROM t GROUP BY 1, 2
),
c AS (
  SELECT source, bin,
         CAST(sum(n) OVER (PARTITION BY source ORDER BY bin) AS BIGINT)
           AS cum,
         CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS total
  FROM h
),
qs(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE))),
sel AS (
  SELECT source, q, min(bin) AS bin, max(total) AS n_docs
  FROM c, qs WHERE cum >= q * total GROUP BY source, q
)
SELECT source, q, CAST(bin AS INT) AS bin,
       -- CAST: a bare 0.05 literal is DECIMAL in DuckDB and would
       -- type-poison the whole edge expression (driver hash is
       -- type-sensitive)
       round(CAST(0.0 AS DOUBLE) + (bin + 1) * CAST(0.05 AS DOUBLE), 6)
         AS upper_edge, n_docs
FROM sel"""

ORACLES["text_quality_percentiles"] = f"""WITH t AS (
  SELECT doc_id, source, {_QUALITY_EXPR} AS quality FROM documents
)
SELECT source, count(*) AS n_docs,
       round(quantile_cont(quality, 0.25), 6) AS p25,
       round(quantile_cont(quality, 0.5), 6) AS p50,
       round(quantile_cont(quality, 0.75), 6) AS p75,
       round(quantile_cont(quality, 0.9), 6) AS p90
FROM t GROUP BY source"""

# incremental dedup: a band-sharing pair has >=1 new side iff it is a
# full-corpus candidate pair touching a seeded (+100000/+200000) id
ORACLES["dedup_incremental"] = f"""WITH {_DOCS_CTE},
{_SHINGLE_CTE},
{_LSH_CTES}
SELECT doc_a, doc_b FROM cand
WHERE doc_a >= 100000 OR doc_b >= 100000"""

ORACLES["text_corpus_stats"] = f"""WITH t AS (
  SELECT source, lang, len({_TOKS}) AS nt, length(text) AS nc FROM documents
)
SELECT source, lang,
       CAST(grouping_id(source, lang) AS INT) AS grouping_level,
       count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       round(avg(nt), 4) AS avg_tokens,
       round(avg(nc), 4) AS avg_chars
FROM t GROUP BY ROLLUP (source, lang)"""

ORACLES["text_winnow_candidates"] = f"""WITH {_DOCS_CTE},
tok AS (SELECT doc_id, {_TOKS} AS w FROM docs),
shl AS (SELECT doc_id, {_SHINGLES3} AS sh FROM tok),
h AS (
  SELECT doc_id,
         list_transform(sh, s -> (('0x' || substr(md5(s || '#0'), 1, 8)))::BIGINT) AS hs
  FROM shl
),
m AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= 4
              THEN [list_aggregate(hs[i:i+3], 'min') for i in range(1, len(hs) - 2)]
              ELSE hs END AS mins
  FROM h
),
fps AS (SELECT DISTINCT doc_id, unnest(mins) AS fp FROM m),
rare AS (
  SELECT f.doc_id, f.fp
  FROM fps f JOIN (SELECT fp FROM (SELECT fp, count(*) AS c FROM fps GROUP BY fp)
                   WHERE c <= 20) r USING (fp)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_fps
FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 2"""

# repetition: independent construction from the Spark side's sorted-
# array run-length fold — per-(doc, n-gram) counts via unnest+GROUP BY
def _rep_oracle(ns=(2, 3, 4), top_thr=0.2, dup_thr=0.3) -> str:
    ctes = [
        f"""r AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN text || '{REP_TAIL}' ELSE text END AS text
  FROM documents
)""",
        "t AS (SELECT doc_id, " + _TOKS + " AS w FROM r)",
    ]
    for n in ns:
        ctes.append(f"""g{n} AS (
  SELECT doc_id, ng, count(*) AS c
  FROM (SELECT doc_id,
               unnest([array_to_string(w[i:i+{n - 1}], ' ')
                       for i in range(1, len(w) - {n - 2})]) AS ng
        FROM t WHERE len(w) >= {n})
  GROUP BY doc_id, ng
),
s{n} AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_g, CAST(max(c) AS BIGINT) AS best,
         CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT) AS dup
  FROM g{n} GROUP BY doc_id
)""")
    cols, joins = [], []
    for n in ns:
        d = f"greatest(coalesce(s{n}.n_g, 0), 1)"
        cols += [
            f"coalesce(s{n}.n_g, 0) AS n_{n}grams",
            f"round(CAST(coalesce(s{n}.best, 0) AS DOUBLE) / {d}, 6) AS top{n}_frac",
            f"round(CAST(coalesce(s{n}.dup, 0) AS DOUBLE) / {d}, 6) AS dup{n}_frac",
        ]
        joins.append(f"LEFT JOIN s{n} ON s{n}.doc_id = t.doc_id")
    d0 = f"greatest(coalesce(s{ns[0]}.n_g, 0), 1)"
    d1 = f"greatest(coalesce(s{ns[1]}.n_g, 0), 1)"
    flag = (
        f"(round(CAST(coalesce(s{ns[0]}.best, 0) AS DOUBLE) / {d0}, 6) > {top_thr}"
        f" OR round(CAST(coalesce(s{ns[1]}.dup, 0) AS DOUBLE) / {d1}, 6) > {dup_thr})"
        " AS is_repetitive"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT t.doc_id,\n  " + ",\n  ".join(cols + [flag])
        + "\nFROM t " + " ".join(joins)
    )


ORACLES["text_repetition"] = _rep_oracle()

# winnowing (k=3 word-shingles, window w=4): min-hash per sliding
# window, distinct set, digest of the sorted set
ORACLES["text_winnow"] = f"""WITH tok AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
),
shl AS (
  SELECT doc_id, {_SHINGLES3} AS sh FROM tok
),
h AS (
  SELECT doc_id,
         list_transform(sh, s -> (('0x' || substr(md5(s || '#0'), 1, 8)))::BIGINT) AS hs
  FROM shl
),
m AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= 4
              THEN [list_aggregate(hs[i:i+3], 'min') for i in range(1, len(hs) - 2)]
              ELSE hs END AS mins
  FROM h
)
SELECT doc_id, len(list_distinct(mins)) AS n_fingerprints,
       md5(array_to_string(list_sort(list_distinct(mins)), ',')) AS winnow_hash
FROM m"""

_V = "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)"
_COS = (
    "list_dot_product(v.e, q.qe) / "
    "(sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(q.qe, q.qe)))"
)

ORACLES["ann_cosine_topk"] = f"""WITH {_V},
q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 8),
p AS (
  SELECT q.qid, v.vec_id AS vid, {_COS} AS s
  FROM v CROSS JOIN q WHERE v.vec_id <> q.qid
)
SELECT qid AS query_id, vid AS neighbor_id, round(s, 4) AS cosine, rank
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, vid) AS INT) AS rank FROM p)
WHERE rank <= 5"""

# Hard negatives: positives = the exact top-2 neighbors (same ranking
# as ann_cosine_topk), negatives = top-5 of what remains. Ranking on
# the exact double, tie-broken by id — identical in both engines.
ORACLES["ann_hard_negatives"] = f"""WITH {_V},
q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 8),
p AS (
  SELECT q.qid, v.vec_id AS vid, {_COS} AS s
  FROM v CROSS JOIN q WHERE v.vec_id <> q.qid
),
r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY s DESC, vid) AS rk FROM p),
neg AS (SELECT qid, vid, s FROM r WHERE rk > 2)
SELECT qid AS query_id, vid AS neg_id, round(s, 4) AS cosine, rank
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, vid) AS INT) AS rank FROM neg)
WHERE rank <= 5"""

_BUCKETS_CTE = f"""{_V},
anch AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS anchor_rank, e AS ae
  FROM v ORDER BY vec_id LIMIT 4
),
buckets AS (
  SELECT v.vec_id,
         CAST(sum(CASE WHEN list_dot_product(v.e, anch.ae) > 0
                       THEN (1 << anchor_rank) ELSE 0 END) AS INT) AS bucket
  FROM v CROSS JOIN anch GROUP BY v.vec_id
)"""

ORACLES["ann_lsh_buckets"] = f"""WITH {_BUCKETS_CTE}
SELECT vec_id, bucket FROM buckets"""

ORACLES["ann_lsh_topk"] = f"""WITH {_BUCKETS_CTE},
corpus AS (SELECT v.vec_id, v.e, b.bucket FROM v JOIN buckets b USING (vec_id)),
q AS (SELECT vec_id AS qid, e AS qe, bucket FROM corpus WHERE vec_id < 8),
p AS (
  SELECT q.qid, v.vec_id AS vid,
         list_dot_product(v.e, q.qe) /
         (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(q.qe, q.qe))) AS s
  FROM corpus v JOIN q ON v.bucket = q.bucket AND v.vec_id <> q.qid
)
SELECT qid AS query_id, vid AS neighbor_id, round(s, 4) AS cosine, rank
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, vid) AS INT) AS rank FROM p)
WHERE rank <= 5"""

# IVF parts WITHOUT the leading `v` CTE, so they compose with other
# CTE chains that already define v (the IVFADC oracle below)
_IVF_PARTS = """anch AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, e AS ce
  FROM v ORDER BY vec_id LIMIT 4
),
csim AS (
  SELECT v.vec_id, anch.cid,
         list_dot_product(v.e, anch.ce) /
         (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(anch.ce, anch.ce))) AS s
  FROM v CROSS JOIN anch
),
assign AS (
  SELECT vec_id, cid AS cluster
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM csim)
  WHERE rn = 1
)"""

_IVF_CTE = f"""{_V},
{_IVF_PARTS}"""

ORACLES["ann_ivf_assign"] = f"""WITH {_IVF_CTE}
SELECT vec_id, CAST(cluster AS INT) AS cluster FROM assign"""


def _lloyd_iter(i: int, prev: str) -> str:
    """One unrolled Lloyd iteration (assign → rounded element means →
    empty-cluster fallback) against centroid CTE ``prev``."""
    return f"""s{i} AS (
  SELECT v.vec_id, {prev}.cid,
         list_dot_product(v.e, {prev}.ce) /
         (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product({prev}.ce, {prev}.ce))) AS s
  FROM v CROSS JOIN {prev}
),
a{i} AS (
  SELECT vec_id, cid AS cluster
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM s{i})
  WHERE rn = 1
),
m{i} AS (
  SELECT cluster, idx, round(avg(val), 6) AS m
  FROM (SELECT a{i}.cluster, unnest(v.e) AS val, unnest(range(len(v.e))) AS idx
        FROM v JOIN a{i} USING (vec_id))
  GROUP BY cluster, idx
),
l{i} AS (SELECT cluster, list(m ORDER BY idx) AS mvec FROM m{i} GROUP BY cluster),
c{i} AS (
  SELECT {prev}.cid, coalesce(l{i}.mvec, {prev}.ce) AS ce
  FROM {prev} LEFT JOIN l{i} ON l{i}.cluster = {prev}.cid
)"""


_KMEANS_CTES = f"""{_V},
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, e AS ce
  FROM v ORDER BY vec_id LIMIT 4
),
{_lloyd_iter(1, "c0")},
{_lloyd_iter(2, "c1")}"""

ORACLES["ann_ivf_train_centroids"] = f"""WITH {_KMEANS_CTES}
SELECT cid, CAST(idx AS INT) AS pos, val
FROM (SELECT cid, unnest(ce) AS val, unnest(range(len(ce))) AS idx FROM c2)"""

ORACLES["ann_ivf_train_assign"] = f"""WITH {_KMEANS_CTES},
sf AS (
  SELECT v.vec_id, c2.cid,
         list_dot_product(v.e, c2.ce) /
         (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c2.ce, c2.ce))) AS s
  FROM v CROSS JOIN c2
)
SELECT vec_id, CAST(cluster AS INT) AS cluster
FROM (
  SELECT vec_id, cid AS cluster
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM sf)
  WHERE rn = 1
)"""

ORACLES["ann_ivf_topk"] = f"""WITH {_IVF_CTE},
probes AS (
  SELECT vec_id AS qid, cid AS cluster
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        FROM csim WHERE vec_id < 8)
  WHERE rn <= 2
),
corpus AS (SELECT v.vec_id, v.e, a.cluster FROM v JOIN assign a USING (vec_id)),
q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 8),
p AS (
  SELECT DISTINCT pr.qid, c.vec_id AS vid,
         list_dot_product(c.e, q.qe) /
         (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(q.qe, q.qe))) AS s
  FROM corpus c JOIN probes pr ON c.cluster = pr.cluster
  JOIN q ON q.qid = pr.qid
  WHERE c.vec_id <> pr.qid
)
SELECT qid AS query_id, vid AS neighbor_id, round(s, 4) AS cosine, rank
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, vid) AS INT) AS rank FROM p)
WHERE rank <= 5"""

# --- product quantization: per-subspace Lloyd (squared-L2 via the
# same three-dot formula order as the Spark side), encode, ADC top-k.
_PQ_L2 = (
    "list_dot_product(v.e, v.e) - 2 * list_dot_product(v.e, {c}.ce)"
    " + list_dot_product({c}.ce, {c}.ce)"
)


def _pq_lloyd(s: int, i: int, prev: str) -> str:
    """One unrolled PQ Lloyd iteration in subspace ``s`` (assign by
    squared L2 → rounded element means → empty-code fallback)."""
    d = _PQ_L2.format(c=prev)
    return f"""pd{i}_{s} AS (
  SELECT v.vec_id, {prev}.code, {d} AS d
  FROM vs{s} v CROSS JOIN {prev}
),
pa{i}_{s} AS (
  SELECT vec_id, code
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, code) AS rn FROM pd{i}_{s})
  WHERE rn = 1
),
pm{i}_{s} AS (
  SELECT code, idx, round(avg(val), 6) AS mv
  FROM (SELECT a.code, unnest(v.e) AS val, unnest(range(len(v.e))) AS idx
        FROM vs{s} v JOIN pa{i}_{s} a USING (vec_id))
  GROUP BY code, idx
),
pl{i}_{s} AS (SELECT code, list(mv ORDER BY idx) AS mvec FROM pm{i}_{s} GROUP BY code),
cb{i}_{s} AS (
  SELECT {prev}.code, coalesce(pl{i}_{s}.mvec, {prev}.ce) AS ce
  FROM {prev} LEFT JOIN pl{i}_{s} ON pl{i}_{s}.code = {prev}.code
)"""


def _pq_ctes(m: int = 4, dim: int = 64, ksub: int = 4, iters: int = 2) -> str:
    d = dim // m
    parts = [_V]
    for s in range(m):
        lo, hi = s * d + 1, (s + 1) * d
        parts.append(f"vs{s} AS (SELECT vec_id, e[{lo}:{hi}] AS e FROM v)")
        parts.append(
            f"cb0_{s} AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)"
            f" AS code, e AS ce FROM vs{s} ORDER BY vec_id LIMIT {ksub})"
        )
        for i in range(1, iters + 1):
            parts.append(_pq_lloyd(s, i, f"cb{i - 1}_{s}"))
    for s in range(m):
        dd = _PQ_L2.format(c="c")
        parts.append(
            f"""ed_{s} AS (
  SELECT v.vec_id, c.code, {dd} AS d
  FROM vs{s} v CROSS JOIN cb{iters}_{s} c
)"""
        )
    enc_union = "\n  UNION ALL\n".join(
        f"""  SELECT vec_id, CAST({s} AS INT) AS sub, code
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, code) AS rn FROM ed_{s})
  WHERE rn = 1"""
        for s in range(m)
    )
    parts.append(f"enc AS (\n{enc_union}\n)")
    return ",\n".join(parts)


_PQ_M, _PQ_ITERS = 4, 2
_PQ_CTES = _pq_ctes(m=_PQ_M, dim=64, ksub=4, iters=_PQ_ITERS)

ORACLES["ann_pq_codebooks"] = f"""WITH {_PQ_CTES}
SELECT sub, code, CAST(idx AS INT) AS pos, val
FROM (
{chr(10).join(f'''  SELECT CAST({s} AS INT) AS sub, code, unnest(ce) AS val,
         unnest(range(len(ce))) AS idx
  FROM cb{_PQ_ITERS}_{s}''' + ('  UNION ALL' if s < _PQ_M - 1 else '') for s in range(_PQ_M))}
)"""

ORACLES["ann_pq_codes"] = f"""WITH {_PQ_CTES}
SELECT vec_id, sub, code FROM enc"""

_PQ_LUT_UNION = "\n  UNION ALL\n".join(
    f"""  SELECT q.vec_id AS qid, CAST({s} AS INT) AS sub, c.code,
         CAST(round(({_PQ_L2.format(c='c').replace('v.e', 'q.e')}) * 1000000) AS BIGINT) AS du
  FROM (SELECT vec_id, e FROM vs{s} WHERE vec_id < 8) q CROSS JOIN cb{_PQ_ITERS}_{s} c"""
    for s in range(_PQ_M)
)

ORACLES["ann_pq_topk"] = f"""WITH {_PQ_CTES},
lut AS (
{_PQ_LUT_UNION}
),
ad AS (
  SELECT l.qid, e.vec_id, CAST(sum(l.du) AS BIGINT) AS su
  FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
  WHERE e.vec_id <> l.qid
  GROUP BY l.qid, e.vec_id
)
SELECT qid AS query_id, vec_id AS neighbor_id, su / 1000000.0 AS adist, rank
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY su, vec_id) AS INT) AS rank FROM ad)
WHERE rank <= 5"""

# refine oracle: the SAME ADC chain shortlists R=20, then the exact
# three-dot squared-L2 over full vectors re-ranks ONLY the shortlist —
# the oracle's own shortlist, so it verifies the refine semantics, not
# a restatement of brute force.
ORACLES["ann_pq_refined"] = f"""WITH {_PQ_CTES},
lut AS (
{_PQ_LUT_UNION}
),
ad AS (
  SELECT l.qid, e.vec_id, CAST(sum(l.du) AS BIGINT) AS su
  FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
  WHERE e.vec_id <> l.qid
  GROUP BY l.qid, e.vec_id
),
short AS (
  SELECT qid, vec_id
  FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY su, vec_id)
          AS r FROM ad)
  WHERE r <= 20
),
fv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
ex AS (
  SELECT s.qid, s.vec_id,
         CAST(round((list_dot_product(q.e, q.e)
                     - 2 * list_dot_product(q.e, v.e)
                     + list_dot_product(v.e, v.e)) * 1000000) AS BIGINT) AS du
  FROM short s
  JOIN fv q ON q.vec_id = s.qid
  JOIN fv v ON v.vec_id = s.vec_id
)
SELECT qid AS query_id, vec_id AS neighbor_id, du / 1000000.0 AS dist, rank
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY du, vec_id)
        AS INT) AS rank FROM ex)
WHERE rank <= 5"""

# TRUE IVFADC oracle: the SAME PQ chain, but the ADC sum is restricted
# to codes whose vector lies in one of the query's nprobe=2 probed IVF
# cells (anch/csim/assign re-derive the coarse quantizer over the same
# `v`), then the exact refine runs on that cell-bounded shortlist — so
# the green row verifies the cell restriction itself, not just the
# refine.
ORACLES["ann_ivfadc_topk"] = f"""WITH {_PQ_CTES},
{_IVF_PARTS},
probes AS (
  SELECT vec_id AS qid, cid AS cluster
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        FROM csim WHERE vec_id < 8)
  WHERE rn <= 2
),
lut AS (
{_PQ_LUT_UNION}
),
ad AS (
  SELECT l.qid, e.vec_id, CAST(sum(l.du) AS BIGINT) AS su
  FROM enc e
  JOIN assign a ON a.vec_id = e.vec_id
  JOIN probes p ON p.cluster = a.cluster
  JOIN lut l ON l.sub = e.sub AND l.code = e.code AND l.qid = p.qid
  WHERE e.vec_id <> l.qid
  GROUP BY l.qid, e.vec_id
),
short AS (
  SELECT qid, vec_id
  FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY su, vec_id)
          AS r FROM ad)
  WHERE r <= 20
),
fv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
ex AS (
  SELECT s.qid, s.vec_id,
         CAST(round((list_dot_product(q.e, q.e)
                     - 2 * list_dot_product(q.e, fv2.e)
                     + list_dot_product(fv2.e, fv2.e)) * 1000000) AS BIGINT) AS du
  FROM short s
  JOIN fv q ON q.vec_id = s.qid
  JOIN fv fv2 ON fv2.vec_id = s.vec_id
)
SELECT qid AS query_id, vec_id AS neighbor_id, du / 1000000.0 AS dist, rank
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY du, vec_id)
        AS INT) AS rank FROM ex)
WHERE rank <= 5"""

# committed-index serving must equal the from-scratch IVFADC+R
# computation value-for-value — same oracle by construction
ORACLES["ann_index_served"] = ORACLES["ann_ivfadc_topk"]

# near-dup runs over the seeded fixture (scaled/shifted copies), not
# the raw corpus — see emb_fixture.
_VFIX = """v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.01)
  FROM embeddings WHERE vec_id % 9 = 0
  UNION ALL
  SELECT vec_id + 200000, list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.05)
  FROM embeddings WHERE vec_id % 13 = 0
)"""

_BUCKETS_FIX_CTE = _BUCKETS_CTE.replace(_V, _VFIX)

ORACLES["embedding_neardup"] = f"""WITH {_BUCKETS_FIX_CTE},
corpus AS (SELECT v.vec_id, v.e, b.bucket FROM v JOIN buckets b USING (vec_id)),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.e, b.e) /
         (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS s
  FROM corpus a JOIN corpus b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(s, 4) AS cosine FROM p WHERE s >= 0.9"""

# PCA covariance: quantize to round(x * 2^14) bigints (exact in double
# — 2^14 is a power of two), EXACT integer moment sums, then the same
# finite double expression reduce_dim.covariance_moments evaluates.
ORACLES["embedding_pca_cov"] = f"""WITH {_V},
qv AS (SELECT vec_id,
              list_transform(e, x -> CAST(round(x * 16384) AS BIGINT)) AS q
       FROM v),
ex AS (SELECT vec_id, unnest(q) AS qx,
              CAST(unnest(range(len(q))) AS INT) AS i
       FROM qv),
s2 AS (
  SELECT a.i AS i, b.i AS j,
         CAST(sum(a.qx * b.qx) AS BIGINT) AS s,
         CAST(sum(a.qx) AS BIGINT) AS s_i,
         CAST(sum(b.qx) AS BIGINT) AS s_j,
         count(*) AS n
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.i >= a.i
  GROUP BY a.i, b.i
)
SELECT i, j, n,
       round(CAST(s_i AS DOUBLE) / n / 16384.0, 8) AS mean_i,
       round(CAST(s_j AS DOUBLE) / n / 16384.0, 8) AS mean_j,
       round((CAST(s AS DOUBLE) / n
              - (CAST(s_i AS DOUBLE) / n) * (CAST(s_j AS DOUBLE) / n))
             / (16384.0 * 16384.0), 8) AS cov
FROM s2"""

# JL projection: replay the md5-derived Achlioptas matrix (salt
# 'jl-v1', u = first 8 md5 hex digits / 2^32, +-sqrt(3/8)/0 by the
# 1/6 / 5/6 thresholds) and fold with list_dot_product — the same
# left-to-right double fold as F.aggregate (the ann oracles already
# rely on this equivalence).
_JL_Y = ",\n       ".join(
    f"round(max(CASE WHEN k = {k} THEN y END), 4) AS y{k}" for k in range(8)
)
ORACLES["embedding_jl_project"] = f"""WITH {_V},
u AS (
  SELECT i, k,
         (('0x' || substr(md5('jl-v1:' || i || ':' || k), 1, 8))::BIGINT)
           / 4294967296.0 AS u
  FROM range(64) t(i), range(8) s(k)
),
mat AS (
  SELECT k, list(CASE WHEN u < 1.0/6 THEN sqrt(3.0/8)
                      WHEN u > 5.0/6 THEN -sqrt(3.0/8)
                      ELSE 0.0 END ORDER BY i) AS wv
  FROM u GROUP BY k
),
proj AS (
  SELECT v.vec_id, m.k, list_dot_product(v.e, m.wv) AS y
  FROM v CROSS JOIN mat m
)
SELECT vec_id,
       {_JL_Y}
FROM proj GROUP BY vec_id"""

# SemDeDup: k-means (same unrolled Lloyd CTEs as ann_ivf_train but with
# the cluster count DERIVED from the corpus count at runtime — the
# balanced semdedup_k rule, k = greatest(4, ceil(sqrt(N))) — over the
# seeded-near-dup fixture), assign to trained centroids, then within-
# cluster pairwise cosine — dup iff a lower-id neighbor scores ≥ 0.95.
# DuckDB evaluates the scalar-subquery LIMIT, so the oracle scales its
# k with the fixture exactly as semantic_dedup does. (ceil(sqrt()) on
# a float is integer-safe here: fixture counts are far below the 2^52
# band where double sqrt could misround an exact square.)
_KMEANS_DERIVED_CTES = f"""{_V},
kk AS (SELECT GREATEST(4, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k FROM v),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, e AS ce
  FROM v ORDER BY vec_id LIMIT (SELECT k FROM kk)
),
{_lloyd_iter(1, "c0")},
{_lloyd_iter(2, "c1")}"""

_KMEANS_FIX_CTES = _KMEANS_DERIVED_CTES.replace(_V, _VFIX)

ORACLES["embedding_semdedup"] = f"""WITH {_KMEANS_FIX_CTES},
sfin AS (
  SELECT v.vec_id, c2.cid,
         list_dot_product(v.e, c2.ce) /
         (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c2.ce, c2.ce))) AS s
  FROM v CROSS JOIN c2
),
asg AS (
  SELECT vec_id, cid AS cluster
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        FROM sfin)
  WHERE rn = 1
),
va AS (SELECT v.vec_id, v.e, a.cluster FROM v JOIN asg a USING (vec_id)),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM va a JOIN va b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.e, b.e) /
              (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
              6) >= 0.95
)
SELECT a.vec_id, CAST(a.cluster AS INT) AS cluster,
       (d.vec_id IS NOT NULL) AS is_semdup
FROM asg a LEFT JOIN dups d USING (vec_id)"""

# resize: output bytes = md5 digest of (hex(media) || 'WxH') where
# hex(media) == md5(text) — so hex(output) == md5(md5(text) || 'WxH')
ORACLES["multimodal_resize"] = """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS media_format,
       CAST(32 AS INT) AS media_width,
       CAST(24 AS INT) AS media_height,
       CAST(16 AS INT) AS media_n_bytes,
       md5(md5(text) || '32x24') AS media_hex
FROM documents"""

ORACLES["multimodal_frames"] = """
SELECT doc_id, CAST(r.i AS INT) AS frame_idx,
       CAST(16 AS INT) AS frame_n_bytes,
       md5(md5(text) || 'frame' || CAST(r.i AS VARCHAR)) AS frame_hex
FROM documents, range(0, 3) r(i)"""

ORACLES["multimodal_metadata"] = """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS media_format,
       CAST(doc_id % 16 + 16 AS INT) AS media_width,
       CAST(doc_id % 9 + 9 AS INT) AS media_height,
       CAST(octet_length(unhex(md5(text))) AS INT) AS media_n_bytes
FROM documents"""

# multimodal_features: the fake kernel hashes hex(media) where
# media = unhex(md5(text)), so hex(media) == md5(text) and the feature
# hash is md5(md5(text)) — fully reproducible in SQL.
ORACLES["multimodal_features"] = """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS media_format,
       round((('0x' || substr(md5(md5(text)), 1, 8))::BIGINT) / 4294967296.0, 6) AS f0,
       round((('0x' || substr(md5(md5(text)), 9, 8))::BIGINT) / 4294967296.0, 6) AS f1,
       round((doc_id % 16 + 16) / 64.0, 6) AS f2,
       round((doc_id % 9 + 9) / 32.0, 6) AS f3
FROM documents"""

# Spark's hex() is uppercase (the Python kernels' bytes.hex() above is
# lowercase) — hence upper() inside the phash md5.
_PHASH = "md5(upper(md5(text)))"

ORACLES["multimodal_phash"] = f"""
SELECT doc_id,
       substr({_PHASH}, 1, 16) AS phash_hex,
       ('0x' || substr({_PHASH}, 1, 4))::BIGINT AS band0,
       ('0x' || substr({_PHASH}, 5, 4))::BIGINT AS band1,
       ('0x' || substr({_PHASH}, 9, 4))::BIGINT AS band2,
       ('0x' || substr({_PHASH}, 13, 4))::BIGINT AS band3
FROM documents"""

ORACLES["multimodal_phash_neardup"] = f"""WITH p AS (
  SELECT doc_id,
         ('0x' || substr({_PHASH}, 1, 4))::BIGINT AS band0,
         ('0x' || substr({_PHASH}, 5, 4))::BIGINT AS band1,
         ('0x' || substr({_PHASH}, 9, 4))::BIGINT AS band2,
         ('0x' || substr({_PHASH}, 13, 4))::BIGINT AS band3
  FROM documents
), u AS (
  SELECT * FROM p
  UNION ALL
  SELECT doc_id + 10000000, xor(band0, 1), band1, xor(band2, 6), band3
  FROM p WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id + 20000000, xor(band0, 15), band1, band2, band3
  FROM p WHERE doc_id % 40 = 0
), c AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM u l JOIN u r
    ON l.doc_id < r.doc_id
   AND (l.band0 = r.band0 OR l.band1 = r.band1
        OR l.band2 = r.band2 OR l.band3 = r.band3)
)
SELECT id_a, id_b,
       CAST(bit_count(xor(a.band0, b.band0)) + bit_count(xor(a.band1, b.band1))
          + bit_count(xor(a.band2, b.band2)) + bit_count(xor(a.band3, b.band3))
            AS INT) AS hamming
FROM c JOIN u a ON a.doc_id = c.id_a JOIN u b ON b.doc_id = c.id_b
WHERE bit_count(xor(a.band0, b.band0)) + bit_count(xor(a.band1, b.band1))
    + bit_count(xor(a.band2, b.band2)) + bit_count(xor(a.band3, b.band3)) <= 3"""


# Triangles: direct a<b<c three-way join (different algorithm than the
# oriented wedge construction it validates). The quadratic rule squares
# the RESIDUE, not doc_id — (doc_id%97)^2 <= 97^2, overflow-free at any
# id, where doc_id*doc_id would overflow BIGINT past doc_id ~ 3.04e9.
ORACLES["graph_triangles"] = """
WITH raw AS (
  SELECT doc_id % 97 AS s, (doc_id * 31 + 7) % 97 AS d FROM documents
  UNION ALL
  SELECT doc_id % 97, ((doc_id % 97) * (doc_id % 97) + 1) % 97 FROM documents
),
und AS (
  SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
  FROM raw WHERE s != d
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT node, count(*) AS n_triangles FROM corners GROUP BY node"""

# PageRank: the oracle replays all 4 rounds as unrolled CTEs
ORACLES["graph_pagerank"] = """
WITH e AS (
  SELECT DISTINCT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst
  FROM documents
  WHERE doc_id % 97 != (doc_id * 31 + 7) % 97
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
s1 AS (
  SELECT e.dst, CAST(sum(r0.r // deg.d) AS BIGINT) AS s
  FROM r0 JOIN deg ON r0.node = deg.src
  JOIN e ON e.src = r0.node
  GROUP BY e.dst
),
r1 AS (
  SELECT n.node,
         CAST(150000 + 850000 * coalesce(s.s, 0) // 1000000 AS BIGINT) AS r
  FROM nodes n LEFT JOIN s1 s ON n.node = s.dst
),
s2 AS (
  SELECT e.dst, CAST(sum(r1.r // deg.d) AS BIGINT) AS s
  FROM r1 JOIN deg ON r1.node = deg.src
  JOIN e ON e.src = r1.node
  GROUP BY e.dst
),
r2 AS (
  SELECT n.node,
         CAST(150000 + 850000 * coalesce(s.s, 0) // 1000000 AS BIGINT) AS r
  FROM nodes n LEFT JOIN s2 s ON n.node = s.dst
),
s3 AS (
  SELECT e.dst, CAST(sum(r2.r // deg.d) AS BIGINT) AS s
  FROM r2 JOIN deg ON r2.node = deg.src
  JOIN e ON e.src = r2.node
  GROUP BY e.dst
),
r3 AS (
  SELECT n.node,
         CAST(150000 + 850000 * coalesce(s.s, 0) // 1000000 AS BIGINT) AS r
  FROM nodes n LEFT JOIN s3 s ON n.node = s.dst
),
s4 AS (
  SELECT e.dst, CAST(sum(r3.r // deg.d) AS BIGINT) AS s
  FROM r3 JOIN deg ON r3.node = deg.src
  JOIN e ON e.src = r3.node
  GROUP BY e.dst
),
r4 AS (
  SELECT n.node,
         CAST(150000 + 850000 * coalesce(s.s, 0) // 1000000 AS BIGINT) AS r
  FROM nodes n LEFT JOIN s4 s ON n.node = s.dst
)
SELECT node, r AS rank_micro FROM r4"""
