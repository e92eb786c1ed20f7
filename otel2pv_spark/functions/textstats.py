"""Text analysis operators over `documents` — language-ID heuristic,
quality scoring, token counting, document fingerprinting. All built-in
column expressions (whole-stage codegen; zero UDFs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


from ..snapshot import snapshot
from .dedup import TOKEN_SPLIT, tokens
from .topk import two_level_topk

# tiny marker-word profiles (public stopword lists, truncated)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "es": ["el", "la", "los", "las", "que", "es", "con", "una"],
    "fr": ["le", "la", "les", "et", "est", "que", "des", "une"],
}

STOPWORDS = LANG_MARKERS["en"]


def _count_in(tok_col, words: list[str]):
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tok_col, lambda w: F.array_contains(arr, w)))


def token_count(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Whitespace/punct token count + BPE-ish subword estimate
    (chars/4 heuristic, the common rule of thumb)."""
    tok = tokens(text_col)
    return df.select(
        id_col,
        F.size(tok).cast("bigint").alias("n_tokens"),
        F.ceil(F.length(text_col) / 4).cast("bigint").alias("n_subwords_est"),
        F.size(F.array_distinct(tok)).cast("bigint").alias("n_unique_tokens"),
    )


def quality_score(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Composite quality heuristics: length, mean word length, stopword
    ratio, punctuation ratio, uniqueness ratio — rounded for cross-
    engine comparison."""
    tok = tokens(text_col)
    n_tok = F.size(tok)
    n_chars = F.length(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z0-9 ]", ""))
    stop = _count_in(tok, STOPWORDS)
    uniq = F.size(F.array_distinct(tok))
    score = (
        F.least(n_tok / 100.0, F.lit(1.0)) * 0.4
        + (stop / F.greatest(n_tok, F.lit(1))) * 0.3
        + (uniq / F.greatest(n_tok, F.lit(1))) * 0.3
    )
    return df.select(
        id_col,
        n_chars.cast("bigint").alias("n_chars"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(stop / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(uniq / F.greatest(n_tok, F.lit(1)), 4).alias("unique_ratio"),
        F.round(score, 4).alias("quality"),
    )


def lang_id(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Marker-word language ID with deterministic ties (en>de>es>fr
    priority order)."""
    tok = tokens(text_col)
    counts = {lang: _count_in(tok, words) for lang, words in LANG_MARKERS.items()}
    pred = (
        F.when(
            (counts["en"] >= counts["de"]) & (counts["en"] >= counts["es"]) & (counts["en"] >= counts["fr"]),
            F.lit("en"),
        )
        .when((counts["de"] >= counts["es"]) & (counts["de"] >= counts["fr"]), F.lit("de"))
        .when(counts["es"] >= counts["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    sel = [F.col(id_col)]
    for lang in LANG_MARKERS:
        sel.append(counts[lang].cast("bigint").alias(f"n_{lang}"))
    sel.append(pred.alias("lang_pred"))
    return df.select(*sel)


# GPT-style pre-tokenizer classes: alpha runs, digit runs, symbol runs.
# Portable Java-regex ∩ RE2 subset so Spark and DuckDB count identically.
BPE_PRETOKEN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"


def subword_count(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """BPE-ish subword token count, one codegen pass: pre-tokenizer
    pieces (alpha/digit/symbol runs) plus an extra piece per 4 chars of
    each long alpha run (approximating merge depth — a 12-char word
    costs ~3 subwords under byte-pair vocabularies)."""
    alpha_runs = F.regexp_extract_all(F.col(text_col), F.lit("[A-Za-z]+"), 0)
    excess = F.aggregate(
        alpha_runs,
        F.lit(0).cast("bigint"),
        lambda acc, wrd: acc
        + (F.ceil(F.length(wrd) / 4.0).cast("bigint") - 1),
    )
    n_pieces = F.regexp_count(F.col(text_col), F.lit(BPE_PRETOKEN))
    return df.select(
        id_col,
        n_pieces.cast("bigint").alias("n_pieces"),
        excess.alias("n_merge_excess"),
        (n_pieces.cast("bigint") + excess).alias("n_subwords_bpe"),
    )


def _winnow_mins(
    df: DataFrame, id_col: str, text_col: str, k: int, w: int
) -> DataFrame:
    """(id, mins) — the selected window-min hashes per document, shared
    by the digest and the exploded-index forms.

    Each stage is materialized as its own projection: the hash array
    is referenced several times by the windowing expression, and a
    single fused expression would let Catalyst inline (= recompute)
    the whole tokenize+shingle+md5 chain per window — O(n²) md5 work
    per document instead of O(n·w) array scans."""
    from .dedup import _hash_shingle, shingles

    hashed = df.select(id_col, tokens(text_col).alias("_w")).select(
        id_col,
        F.transform(
            shingles(F.col("_w"), k), lambda s: _hash_shingle(s, F.lit(0))
        ).alias("_h"),
    )
    h = F.col("_h")
    n = F.size(h)
    mins = F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(1), n - (w - 1)),
            lambda i: F.array_min(F.slice(h, i, w)),
        ),
    ).otherwise(h)
    return hashed.select(id_col, mins.alias("mins"))


def winnow_fingerprint(
    df: DataFrame, id_col="doc_id", text_col="text", k: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every k-gram (rolling shingle hash), keep the MIN
    of each sliding window of w hashes, fingerprint = the distinct min
    set. Near-identical documents share most fingerprints; the md5 of
    the sorted set gives an indexable digest. All higher-order column
    functions — zero UDFs, embarrassingly parallel, no shuffle."""
    windowed = _winnow_mins(df, id_col, text_col, k, w).select(
        id_col, F.array_sort(F.array_distinct("mins")).alias("_fp")
    )
    return windowed.select(
        id_col,
        F.size("_fp").cast("bigint").alias("n_fingerprints"),
        F.md5(
            F.concat_ws(",", F.transform("_fp", lambda x: x.cast("string")))
        ).alias("winnow_hash"),
    )


def _run_stats(sorted_arr):
    """(best, dup) over a SORTED string array: best = the max
    multiplicity of any element, dup = total occurrences of elements
    appearing ≥2 times — via a single run-length fold (aggregate with a
    struct accumulator + finish lambda). O(n log n) per row including
    the sort, all codegen, instead of an explode + two groupBy shuffles
    per n-gram order."""
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
        F.lit(0).cast("bigint").alias("dup"),
    )

    def merge(acc, x):
        same = acc["prev"] == x
        new_run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("bigint"))
        closed = F.when(
            (~same) & (acc["run"] >= 2), acc["dup"] + acc["run"]
        ).otherwise(acc["dup"])
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
            closed.alias("dup"),
        )

    def finish(acc):
        dup = F.when(acc["run"] >= 2, acc["dup"] + acc["run"]).otherwise(acc["dup"])
        return F.struct(acc["best"].alias("best"), dup.alias("dup"))

    return F.aggregate(sorted_arr, zero, merge, finish)


def repetition_scores(
    df: DataFrame,
    id_col="doc_id",
    text_col="text",
    ns: tuple[int, ...] = (2, 3, 4),
    top_threshold: float = 0.2,
    dup_threshold: float = 0.3,
) -> DataFrame:
    """Gopher-style repetition filters, token-n-gram form: for each n,
    the fraction of n-gram occurrences taken by the single most
    frequent n-gram (top{n}_frac) and by all n-grams occurring ≥2 times
    (dup{n}_frac). ``is_repetitive`` trips when the 2-gram top fraction
    or the 3-gram dup fraction exceeds its threshold — the standard
    boilerplate/template-spam signal.

    Scale shape: per-document array fold over sorted n-grams — an
    embarrassingly parallel projection with NO shuffle at any n (the
    explode+groupBy formulation shuffles len(ns)× the token count)."""
    from .dedup import shingles

    tokd = df.select(F.col(id_col), tokens(text_col).alias("_w"))
    stage = tokd.select(
        id_col,
        *[
            F.array_sort(shingles(F.col("_w"), n)).alias(f"_g{n}")
            for n in ns
        ],
    ).select(
        id_col,
        *[c for n in ns for c in (
            F.size(f"_g{n}").cast("bigint").alias(f"_n{n}"),
            _run_stats(F.col(f"_g{n}")).alias(f"_s{n}"),
        )],
    )
    out = [F.col(id_col)]
    for n in ns:
        denom = F.greatest(F.col(f"_n{n}"), F.lit(1))
        out.append(F.col(f"_n{n}").alias(f"n_{n}grams"))
        out.append(F.round(F.col(f"_s{n}.best") / denom, 6).alias(f"top{n}_frac"))
        out.append(F.round(F.col(f"_s{n}.dup") / denom, 6).alias(f"dup{n}_frac"))
    scored = stage.select(*out)
    # the flag is defined on the shortest-n top fraction and the
    # NEXT-n dup fraction (Gopher's 2-gram-top / 3-gram-dup rule under
    # the default ns); with a single n, the dup fraction of that same n
    # stands in — hard-indexing ns[1] crashed on one-element tuples
    flag = (F.col(f"top{ns[0]}_frac") > top_threshold) | (
        F.col(f"dup{ns[1] if len(ns) > 1 else ns[0]}_frac") > dup_threshold
    )
    return scored.select("*", flag.alias("is_repetitive"))


def quality_percentiles(
    df: DataFrame,
    by: str = "source",
    ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain exact percentiles of the quality score — how a
    curation run CALIBRATES its quality threshold instead of guessing
    one (a global cutoff over-filters low-scoring-but-fine domains).
    Exact percentile with linear interpolation (matches DuckDB's
    quantile_cont), one sort-based aggregation per group; at 100 TB
    swap F.percentile for percentile_approx(t-digest) — same plan
    shape, bounded memory — and recalibrate on a sample."""
    q = quality_score(df, id_col=id_col, text_col=text_col).select(
        id_col, "quality"
    )
    tagged = df.select(id_col, by).join(q, id_col)
    return tagged.groupBy(by).agg(
        F.count("*").alias("n_docs"),
        *[
            F.round(F.percentile("quality", F.lit(p)), 6).alias(
                f"p{int(p * 100)}"
            )
            for p in ps
        ],
    )


def corpus_stats(
    df: DataFrame,
    by: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Corpus summary table with subtotals: per (source, lang), per
    source, and grand total in ONE pass via ROLLUP — the audit table a
    curation run publishes next to its output (what went in, from
    where, how big). grouping_id disambiguates subtotal rows from
    genuine NULL group values.

    Scale shape: rollup is a single map-side-combined hash aggregation
    (Spark expands grouping sets in the partial agg); output is
    #sources × #langs rows — driver-safe at any corpus size."""
    tok = tokens(text_col)
    base = df.select(
        *by,
        F.size(tok).cast("bigint").alias("_nt"),
        F.length(text_col).cast("bigint").alias("_nc"),
    )
    return (
        base.rollup(*by)
        .agg(
            F.grouping_id().cast("int").alias("grouping_level"),
            F.count("*").alias("n_docs"),
            F.sum("_nt").alias("total_tokens"),
            F.round(F.avg("_nt"), 4).alias("avg_tokens"),
            F.round(F.avg("_nc"), 4).alias("avg_chars"),
        )
        .select(*by, "grouping_level", "n_docs", "total_tokens", "avg_tokens", "avg_chars")
    )


def winnow_fingerprint_set(
    df: DataFrame, id_col="doc_id", text_col="text", k: int = 3, w: int = 4
) -> DataFrame:
    """Exploded winnowing fingerprints: one (id, fp) row per distinct
    selected min-hash — the joinable form of ``winnow_fingerprint``
    (which digests the same set). This is the stored index for
    passage-overlap detection."""
    return _winnow_mins(df, id_col, text_col, k, w).select(
        id_col, F.explode(F.array_distinct("mins")).alias("fp")
    )


def winnow_candidates(
    df: DataFrame,
    id_col="doc_id",
    text_col="text",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 20,
) -> DataFrame:
    """Passage-overlap candidate pairs (MOSS-style): documents sharing
    ≥ ``min_shared`` winnowing fingerprints. Catches CONTAINMENT — a
    paragraph lifted into a larger document — which whole-document
    MinHash-Jaccard misses (the union term drowns a small shared
    passage).

    Scale shape: same bucketed-join family as LSH — fingerprints are
    the buckets. ``max_df`` drops fingerprints appearing in more
    documents than that (boilerplate phrases; one tiny df-count agg),
    which is what bounds bucket size and keeps the self-join from
    going quadratic on common n-grams. Output: (doc_a, doc_b,
    n_shared_fps)."""
    # snapshot the (id, fp) table once: it feeds the df-count agg AND
    # both self-join sides, and AQE does not reuse self-join exchanges
    # (see dedup.minhash_lsh_candidates) — without this the rolling-
    # hash fingerprint subtree executes three times. Narrow rows, so
    # the snapshot is small; production stores it as the index table.
    fps = winnow_fingerprint_set(df, id_col, text_col, k, w).transform(
        snapshot
    )
    dfreq = fps.groupBy("fp").agg(F.count("*").alias("_df"))
    rare = fps.join(dfreq.filter(F.col("_df") <= max_df).select("fp"), "fp")
    a = rare.select(F.col(id_col).alias("doc_a"), "fp")
    b = rare.select(F.col(id_col).alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )


def fingerprint(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set (robust to reordering/duplication — the cheap
    winnowing stand-in), plus the exact content hash."""
    tok = tokens(text_col)
    return df.select(
        id_col,
        F.md5(F.col(text_col)).alias("content_hash"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tok)))).alias("token_set_hash"),
    )


def classifier_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: DataFrame | None = None,
    bias: float = 0.0,
    salt: str = "clf-v1",
    round_to: int = 6,
) -> DataFrame:
    """fastText-style linear classifier inference (token features →
    mean weight → sigmoid) — the standard quality-classifier shape
    (e.g. the CCNet/GPT-3 "looks like reference corpus" filters).

    Two execution paths:

    - ``weights=None`` (hashing trick, the fastText vocabulary layout):
      each token's weight is a deterministic hash of (token, salt)
      mapped to [-1, 1]. A trained hashed model differs only in the
      values; the DATAFLOW is identical — and here it is a pure
      whole-stage-codegen projection: zero shuffle, zero UDFs, the
      per-token weight computed inside one F.aggregate fold.
    - ``weights`` = (token, weight) table: explode tokens → broadcast
      join the weight table (OOV tokens weigh 0) → one groupBy(doc)
      mean. One shuffle on the doc id; the model broadcasts — at
      fastText-scale vocabularies (2M buckets × 8 bytes) that is a
      16 MB broadcast, fine on any executor.

    Output: (id, n_tokens, score, label) with score = round(sigmoid(
    bias + mean(w)), round_to), label = score >= 0.5.
    """
    tok = tokens(text_col)

    if weights is None:
        # hash → [-1, 1]: int(md5(tok '#' salt)[:8], 16) % 2001 → ±1000/1000
        w_of = lambda t: (  # noqa: E731
            F.conv(
                F.substring(F.md5(F.concat_ws("#", t, F.lit(salt))), 1, 8), 16, 10
            ).cast("bigint")
            % 2001
            - 1000
        ) / 1000.0
        n_tok = F.size(tok)
        total = F.aggregate(tok, F.lit(0.0), lambda acc, t: acc + w_of(t))
        mean_w = F.when(n_tok > 0, total / n_tok).otherwise(F.lit(0.0))
        score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(bias) + mean_w))), round_to)
        return df.select(
            F.col(id_col),
            n_tok.cast("bigint").alias("n_tokens"),
            score.alias("score"),
            (score >= 0.5).alias("label"),
        )

    # explode_outer, not explode: a zero-token (or null-text) document
    # must still appear in the output — with mean weight 0, exactly as
    # the hashing path scores it.
    exploded = df.select(F.col(id_col), F.explode_outer(tok).alias("token"))
    scored = exploded.join(F.broadcast(weights), "token", "left").select(
        id_col,
        F.col("token").isNotNull().cast("int").alias("is_tok"),
        F.coalesce("weight", F.lit(0.0)).alias("w"),
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("is_tok").cast("bigint").alias("n_tokens"),
        (F.sum("w") / F.greatest(F.sum("is_tok"), F.lit(1))).alias("_mean_w"),
    )
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(bias) + F.col("_mean_w")))), round_to
    )
    return agg.select(
        id_col,
        "n_tokens",
        score.alias("score"),
        (score >= 0.5).alias("label"),
    )


def vocab_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus vocabulary induction (tokenizer-training input): per
    token, total term frequency and document frequency. One explode +
    one groupBy; both aggregates partial-aggregate map-side (the
    distinct-count dedups (token, doc) pairs per task), so hot tokens
    ('the') shuffle partial state, not per-occurrence rows."""
    exploded = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    return exploded.groupBy("token").agg(
        F.count("*").alias("tf"),
        F.count_distinct(id_col).alias("df"),
    )


def ngram_lm(
    df: DataFrame,
    n: int = 3,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Count-based n-gram LM estimation (the distributed half of a
    KenLM-style pipeline): corpus n-gram counts, (n-1)-gram context
    counts, MLE conditional probability, and count pruning (n-grams
    below ``min_count`` dropped — the standard trim that keeps web-
    scale count tables manageable).

    The context denominator is the sum of the context's CONTINUATION
    counts (sum over w of c(context·w)), not the raw (n-1)-gram
    occurrence count — a context occurrence at a document end has no
    continuation, and counting it would deflate every probability so
    they no longer sum to 1 per context (proper MLE needs
    P(w|h) = c(hw) / Σ_w c(hw)).

    Scale shape: ONE exploded map-side-combined groupBy (hot n-grams
    shuffle partial counts), the context table derived from it by a
    second tiny aggregate over the distinct-n-gram rows, then one
    AQE-skew-splittable equi-join of the pruned n-grams against the
    contexts. No driver-side state, no vocabulary assumption.
    """
    from .dedup import shingles

    toks = df.select(tokens(text_col).alias("_w"))
    grams_all = (
        toks.select(F.explode(shingles(F.col("_w"), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("count"))
    )
    # materialize the distinct-ngram counts ONCE: both consumers below
    # (the pruned gram table and the context sums) hang off this
    # aggregate, but the final join pushes different IsNotNull filters
    # into each branch, so subtree equality — and with it Catalyst's
    # ReuseExchange — breaks, and an unmaterialized plan scans and
    # explodes the whole corpus twice. The checkpointed table is the
    # distinct n-gram count table: orders of magnitude smaller than the
    # corpus (the same size argument as the winnowing stages above).
    grams_all = grams_all.transform(snapshot)
    contexts = (
        grams_all.groupBy(
            F.substring_index("ngram", " ", n - 1).alias("context")
        )
        .agg(F.sum("count").alias("context_count"))
    )
    grams = grams_all.filter(F.col("count") >= min_count)
    joined = grams.withColumn(
        "context", F.substring_index("ngram", " ", n - 1)
    ).join(contexts, "context")
    return joined.select(
        "ngram",
        "count",
        "context_count",
        F.round(F.col("count") / F.col("context_count"), round_to).alias("cond_prob"),
    )


def lm_perplexity(
    df: DataFrame,
    lm: DataFrame,
    n: int = 3,
    unk_prob: float = 1e-6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document perplexity under an n-gram LM table (the scoring
    half of a CCNet-style quality pipeline: score every document
    against a reference-corpus LM, then filter/bucket on perplexity).
    ``lm`` is an ``ngram_lm``-shaped table (ngram, cond_prob); n-grams
    absent from it (pruned or unseen) score at the ``unk_prob`` floor.

    Determinism contract: each n-gram's cost is quantized row-locally
    to integer micro-bits (round(-log2(p) * 1e6)) BEFORE the per-doc
    aggregate, so the cross-row sum is exact integer arithmetic —
    immune to float summation order, which varies run-to-run with
    partitioning (a raw avg(log2 p) would be ±1 ULP nondeterministic).

    Scale shape: explode → ONE equi-join on ngram (the LM side is the
    pruned count table, far smaller than the corpus but not broadcast-
    sized at 100 TB; hot n-grams skew the join and AQE splits them) →
    one map-side-combined groupBy(doc). Docs shorter than n tokens
    emit n_ngrams = 0 with null perplexity (left join back), so the
    operator is total over the corpus.
    """
    from .dedup import shingles

    # staged projection: a fused explode(shingles(tokens(...))) lets
    # Catalyst inline the tokenizer into the per-shingle slice lambda —
    # O(ngrams × tokenize) per document (the winnowing lesson above)
    grams = df.select(F.col(id_col), tokens(text_col).alias("_w")).select(
        id_col, F.explode(shingles(F.col("_w"), n)).alias("ngram")
    )
    # floor PRESENT probabilities too, not just absent ones: ngram_lm
    # rounds cond_prob to 6 decimals, so an ultra-rare gram can land in
    # the table as exactly 0.0 — log2(0) is NULL in Spark (+inf in
    # DuckDB) and would silently contribute 0 bits while still counting
    # in n_ngrams, scoring the worst documents as the best
    p = F.greatest(
        F.coalesce(F.col("cond_prob"), F.lit(float(unk_prob))),
        F.lit(float(unk_prob)),
    )
    scored = grams.join(lm.select("ngram", "cond_prob"), "ngram", "left").select(
        id_col,
        F.round(-F.log2(p) * F.lit(1e6)).cast("bigint").alias("_bits_micro"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_ngrams"),
        F.sum("_bits_micro").alias("bits_micro"),
    )
    avg_bits = F.col("bits_micro") / F.lit(1e6) / F.col("n_ngrams")
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).cast("bigint").alias("n_ngrams"),
            F.coalesce("bits_micro", F.lit(0)).cast("bigint").alias("bits_micro"),
            F.round(avg_bits, 6).alias("bits_per_ngram"),
            F.round(F.pow(F.lit(2.0), avg_bits), 4).alias("perplexity"),
        )
    )


def bpe_pair_counts(df: DataFrame, text_col: str = "text",
                    min_count: int = 1) -> DataFrame:
    """One round of BPE tokenizer training: corpus-wide counts of
    adjacent symbol pairs, weighted by word frequency — the merge-rank
    statistic a trainer maximizes each iteration (the counting is the
    distributed-scale part; applying the chosen merge is driver-side
    config, not data).

    Scale shape: words aggregate FIRST (map-side-combined groupBy on
    the word — the corpus collapses to its vocabulary, which is orders
    of magnitude smaller than the token stream), then pairs explode
    from DISTINCT words only, weighted by the word count, into a
    second map-side-combined groupBy(pair). The pair explosion is
    bounded by Σ|word| over the vocabulary, not over the corpus."""
    words = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )
    # pairs via substr, not split(word, "") — empty-pattern split edge
    # behavior (trailing empties) is engine-specific; substr is portable
    w = F.col("word")
    pairs = F.when(
        F.length(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(w) - 1),
            lambda i: F.concat_ws(" ", w.substr(i, F.lit(1)), w.substr(i + 1, F.lit(1))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.explode(pairs).alias("pair"), "wc")
        .groupBy("pair")
        .agg(F.sum("wc").alias("count"))
        .filter(F.col("count") >= min_count)
    )


# --- full BPE training / encoding --------------------------------------
#
# Symbol representation: a word's current symbol sequence is a single
# string with every symbol wrapped in sentinels, "<t><h><e>". Tokens
# are strictly [a-z0-9]+ (dedup.TOKEN_SPLIT), so '<' and '>' can never
# occur inside a symbol. With this encoding, applying merge (l, r) is a
# plain LITERAL string replace "<l><r>" -> "<lr>", and left-to-right
# non-overlapping replace (Java String.replace == DuckDB replace())
# reproduces exact greedy BPE merge semantics: the pattern starts and
# ends on sentinels, so consuming a match never eats the boundary of
# the next one (the classic " a b " space-delimited encoding fails on
# odd self-merge runs like "a a a a a" precisely because it must
# consume a shared separator), and a merged symbol "<lr>" can never
# complete a new match of the same pattern.


def _bpe_wrap(word_col):
    """word -> "<c1><c2>...": each char wrapped in sentinel brackets."""
    return F.concat(
        F.lit("<"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.length(word_col)),
                lambda i: word_col.substr(i, F.lit(1)),
            ),
            "><",
        ),
        F.lit(">"),
    )


def _bpe_syms(seq_col):
    """"<ab><c>" -> ["ab", "c"] (current symbol array)."""
    return F.split(F.regexp_replace(seq_col, "^<|>$", ""), "><")


def _bpe_replace(seq_col, left: str, right: str):
    return F.replace(
        seq_col, F.lit(f"<{left}><{right}>"), F.lit(f"<{left}{right}>")
    )


def bpe_train(df: DataFrame, n_merges: int = 3,
              text_col: str = "text") -> DataFrame:
    """Full BPE tokenizer training: learn ``n_merges`` merges by
    repeatedly counting corpus-wide adjacent-symbol pairs (weighted by
    word frequency) and merging the most frequent pair everywhere.
    Ties break deterministically on the space-joined pair string
    (equivalent to (left, right) tuple order — the separator sorts
    below every symbol char). Returns the merge table
    (rank, left_sym, right_sym, merged, pair_count).

    Scale shape (the same one real distributed BPE trainers use): the
    corpus collapses ONCE to its vocabulary (map-side-combined groupBy
    on the word — orders of magnitude smaller than the token stream);
    every round then runs over vocab-sized data only: one explode +
    map-side-combined groupBy for pair counts, a 1-row argmax collect
    (the merge table is config, not data — same broadcast argument as
    make_anchors), and a pure-projection literal replace. The vocab is
    snapshot()-ed per round so round r+1 doesn't re-execute
    rounds 1..r (the Lloyd-iteration lesson)."""
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
        .select(_bpe_wrap(F.col("word")).alias("seq"), "wc")
        .transform(snapshot)
    )
    spark = df.sparkSession
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        syms = _bpe_syms(F.col("seq"))
        pairs = F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(syms, i), F.element_at(syms, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        best = (
            vocab.select(F.explode(pairs).alias("pair"), "wc")
            .groupBy("pair")
            .agg(F.sum("wc").alias("c"))
            .orderBy(F.col("c").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["pair"].split(" ", 1)
        merges.append((rank, left, right, left + right, int(best[0]["c"])))
        vocab = vocab.withColumn(
            "seq", _bpe_replace(F.col("seq"), left, right)
        ).transform(snapshot)
    return spark.createDataFrame(
        merges,
        "rank int, left_sym string, right_sym string, "
        "merged string, pair_count bigint",
    )


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document with a trained/configured BPE merge list
    (applied in rank order — exact greedy merge semantics, see the
    sentinel-encoding note above). Returns per-doc
    (id, n_tokens, n_bpe_tokens, bpe_text) where ``bpe_text`` is the
    space-joined subword stream.

    Zero shuffles, zero UDFs: the merge list is compile-time config
    (len(merges) chained literal replaces inside one whole-stage-
    codegen projection) — at 100 TB this is a map-only scan."""

    def encode(tok):
        seq = _bpe_wrap(tok)
        for left, right in merges:
            seq = _bpe_replace(seq, left, right)
        return _bpe_syms(seq)

    toks = tokens(text_col)
    subwords = F.flatten(F.transform(toks, encode))
    return df.select(
        id_col,
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(subwords).cast("bigint").alias("n_bpe_tokens"),
        F.array_join(subwords, " ").alias("bpe_text"),
    )


# --- BM25 retrieval ------------------------------------------------------


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 keyword retrieval: score every document against a small
    CONFIG set of ``(query_id, query_text)`` queries and return the
    top-k documents per query as (query_id, doc_id, score_micro, rank).

    Okapi BM25 with the Lucene idf form
    ``ln((N - df + 0.5)/(df + 0.5) + 1)`` (always positive). Per-term
    contributions are quantized row-locally to integer micro-units
    (round(c * 1e6)) BEFORE the per-(query, doc) sum, so the cross-row
    double sum is order-independent (same determinism contract as
    ``lm_perplexity``).

    Scale shape: the token stream is filtered to QUERY TERMS ONLY
    before the explode (array_filter against a literal array — the
    posting list for a handful of terms, not the corpus vocabulary),
    then ONE map-side-combined groupBy builds (doc, term, tf). Corpus
    stats (N, avgdl) are a 1-row aggregate cross-joined back; df(term)
    is a #terms-row aggregate joined back by broadcast; the query
    expansion is a broadcast join. Final top-k uses the two-level
    partial-top-k pattern (per input-partition first, then a k×P
    merge) — no per-query window ever sees the whole corpus.
    """
    qdf, terms = _query_terms(df.sparkSession, queries)
    term_arr = F.array(*[F.lit(t) for t in terms])

    toks = tokens(text_col)
    docs = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.size(toks).cast("double").alias("_dl"),
    )
    stats = docs.agg(
        F.count("*").cast("double").alias("_n_docs"),
        F.sum("_dl").alias("_sum_dl"),
    )
    posts = (
        docs.select(
            id_col,
            "_dl",
            F.explode(
                F.filter("_toks", lambda w: F.array_contains(term_arr, w))
            ).alias("term"),
        )
        .groupBy(id_col, "term", "_dl")
        .agg(F.count("*").cast("double").alias("_tf"))
    )
    return _bm25_score(posts, stats, qdf, k=k, k1=k1, b=b, id_col=id_col)


def _query_terms(spark, queries: list[tuple[str, str]]):
    """(query_id, term) expansion table + the sorted distinct terms."""
    import re as _re

    qrows = [
        (qid, t)
        for qid, qtext in queries
        for t in sorted(set(_re.split(TOKEN_SPLIT, qtext.lower())) - {""})
    ]
    qdf = spark.createDataFrame(qrows, "query_id string, term string")
    return qdf, sorted({t for _, t in qrows})


def _bm25_score(
    posts: DataFrame,
    stats: DataFrame,
    qdf: DataFrame,
    k: int,
    k1: float,
    b: float,
    id_col: str,
) -> DataFrame:
    """Shared BM25 scoring tail over a (id, _dl, term, _tf) posting set
    restricted to query terms, with (_n_docs, _sum_dl) corpus stats.
    df(term) is derived from the postings themselves — exact, because a
    term's posting list contains every document containing it."""
    idf = (
        posts.groupBy("term")
        .agg(F.count("*").cast("double").alias("_df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.log(
                (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
                + 1.0
            ).alias("_idf"),
            (F.col("_sum_dl") / F.col("_n_docs")).alias("_avgdl"),
        )
    )
    contrib = (
        posts.join(F.broadcast(idf), "term")
        .join(F.broadcast(qdf), "term")
        .select(
            "query_id",
            id_col,
            F.round(
                F.col("_idf")
                * (F.col("_tf") * (k1 + 1.0))
                / (
                    F.col("_tf")
                    + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("_c_micro"),
        )
    )
    scored = contrib.groupBy("query_id", id_col).agg(
        F.sum("_c_micro").alias("score_micro")
    )
    return two_level_topk(
        scored, ["query_id"], [F.desc("score_micro"), F.col(id_col)], k
    ).select("query_id", id_col, "score_micro", "rank")


def bm25_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Build the persistable BM25 inverted index: the retrieval scale
    path (``bm25_topk`` rescans the corpus per query batch; at 100 TB
    you pay the scan ONCE here, write the index partitioned/bucketed
    by term, and every query batch probes only its terms' postings).

    Returns (postings, stats): postings = one row per (term, doc) with
    the term frequency and the doc length denormalized onto the row
    (trades ~8 bytes/posting for a join-free probe — the analog of
    Lucene keeping norms alongside postings); stats = the 1-row
    (n_docs, sum_dl) corpus aggregate. Same incremental-index pattern
    as ``dedup.minhash_band_table``.
    """
    toks = tokens(text_col)
    docs = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.size(toks).cast("double").alias("_dl"),
    )
    stats = docs.agg(
        F.count("*").cast("double").alias("_n_docs"),
        F.sum("_dl").alias("_sum_dl"),
    )
    postings = (
        docs.select(id_col, "_dl", F.explode("_toks").alias("term"))
        .groupBy("term", id_col, "_dl")
        .agg(F.count("*").cast("double").alias("_tf"))
        .select("term", id_col, "_tf", "_dl")
    )
    return postings, stats


def bm25_topk_from_index(
    postings: DataFrame,
    stats: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k served from a prebuilt ``bm25_index`` — identical
    scores/ranks to ``bm25_topk``, but the corpus text is never read:
    the probe filters the posting table to the query terms (an isin
    predicate that partition-prunes a term-partitioned index table)
    and everything downstream runs on posting-list-sized data."""
    qdf, terms = _query_terms(postings.sparkSession, queries)
    posts = postings.filter(F.col("term").isin(terms)).select(
        id_col, "_dl", "term", "_tf"
    )
    return _bm25_score(posts, stats, qdf, k=k, k1=k1, b=b, id_col=id_col)


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide k most frequent word n-grams (frequent-items scan:
    boilerplate discovery, stopword mining, contamination signatures).

    Scale shape: ONE exploded map-side-combined groupBy (hot n-grams
    shuffle partial counts, never per-occurrence rows), then a
    TWO-LEVEL top-k — partial top-k inside each post-shuffle partition
    of the counts table, final window over the <= partitions x k
    survivors — so the (corpus-sized) distinct-n-gram table is never
    funneled through a single-partition window. Ties broken by n-gram
    text for cross-engine determinism.
    """
    from .dedup import shingles

    # staged projection: tokens bound to a column BEFORE shingling —
    # an expression referenced inside shingles' per-position lambda is
    # re-evaluated per element (the _minhash_wide lesson, measured 6x)
    grams = (
        df.select(tokens(text_col).alias("_w"))
        .select(F.explode(shingles(F.col("_w"), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("count"))
    )
    return two_level_topk(
        grams, [], [F.desc("count"), F.col("ngram")], k
    ).select("ngram", "count", "rank")


def quality_histogram(
    df: DataFrame,
    by: str = "source",
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MERGEABLE binned histogram of the quality score, per domain —
    the maintainable state behind threshold calibration. Exact
    percentiles (``quality_percentiles``) need a per-group sort over
    raw scores every time; a fixed-bin histogram is integer counts
    that merge across append batches by summing (``histogram_merge``),
    the same maintained-state pattern as ``aggregate.rollup_merge``.

    Returns (by, bin, n) with bin = clamp(floor((q - lo)/width), 0,
    bins-1); out-of-range scores land in the edge bins. One map-side-
    combined groupBy; output is |domains| x bins rows.
    """
    width = (hi - lo) / bins
    q = quality_score(df, id_col=id_col, text_col=text_col).select(
        id_col, "quality"
    )
    tagged = df.select(id_col, by).join(q, id_col)
    b = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0), F.floor((F.col("quality") - lo) / width).cast("int")
        ),
    )
    return tagged.groupBy(F.col(by), b.alias("bin")).agg(
        F.count("*").alias("n")
    )


def histogram_merge(a: DataFrame, b: DataFrame, by: str = "source") -> DataFrame:
    """Merge two histogram states (same lo/hi/bins): counts just add."""
    return (
        a.unionByName(b)
        .groupBy(by, "bin")
        .agg(F.sum("n").alias("n"))
    )


def histogram_quantiles(
    hist: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9),
    by: str = "source",
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 20,
) -> DataFrame:
    """Bin-resolution quantiles from histogram state: for each q, the
    smallest bin whose cumulative count reaches q x total, reported as
    that bin's upper edge (a <= width over-estimate — the trade for
    mergeability). Runs entirely on the |domains| x bins state table;
    the corpus is never touched.
    """
    width = (hi - lo) / bins
    spark = hist.sparkSession
    qdf = spark.createDataFrame([(float(x),) for x in qs], "q double")
    w_cum = Window.partitionBy(by).orderBy("bin")
    w_all = Window.partitionBy(by)
    c = hist.select(
        by,
        "bin",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
    )
    sel = (
        c.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") >= F.col("q") * F.col("total"))
        .groupBy(by, "q")
        .agg(F.min("bin").alias("bin"), F.max("total").alias("n_docs"))
    )
    return sel.select(
        by,
        "q",
        "bin",
        F.round(F.lit(lo) + (F.col("bin") + 1) * width, 6).alias("upper_edge"),
        "n_docs",
    )


def ppl_buckets(
    df: DataFrame,
    lm: DataFrame,
    by: str = "source",
    n: int = 3,
    unk_prob: float = 1e-6,
    bins: int = 64,
    hi_micro: int = 20_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style head/middle/tail perplexity bucketing (Wenzek et
    al. 2020): score every document against a reference LM
    (:func:`lm_perplexity`), then split each ``by`` domain at its own
    perplexity tertiles — 'head' is the cleanest third of the domain,
    'tail' the noisiest, so a downstream sampler can mix buckets
    instead of applying one global threshold that would starve
    high-perplexity domains.

    Determinism contract: the per-doc metric is integer micro-bits
    per n-gram (``bits_micro DIV n_ngrams`` — exact BIGINT floor, no
    float averaging), binned into ``bins`` fixed-width integer bins
    over [0, hi_micro); tertile cuts come from the per-domain bin
    histogram with exact integer thresholds (``3 * cum >= total`` /
    ``3 * cum >= 2 * total``), so every comparison on the way to a
    bucket label is integer arithmetic an oracle reproduces exactly.
    Docs with no n-grams (shorter than n tokens) bucket 'unscored'.

    Scale shape: one LM join + per-doc groupBy (lm_perplexity), then
    ONE map-side-combined groupBy onto the |domains| x bins histogram;
    cuts are computed on that config-sized state (the only windows run
    over it, never the corpus) and broadcast back — the corpus is
    scanned once and never globally sorted. hi_micro defaults just
    above the unk-floor cost (-log2(1e-6) ~ 19.93 bits), so the top
    bin is the all-unknown pathology.
    """
    width_micro = hi_micro // bins
    scored = lm_perplexity(
        df, lm, n=n, unk_prob=unk_prob, id_col=id_col, text_col=text_col
    ).select(id_col, "n_ngrams", "bits_micro")
    metric = F.when(
        F.col("n_ngrams") > 0, F.expr("bits_micro DIV n_ngrams")
    )
    binned = (
        df.select(id_col, by)
        .join(scored, id_col)
        .select(
            id_col,
            by,
            F.col("n_ngrams"),
            metric.alias("mb_per_ngram"),
            F.when(
                F.col("n_ngrams") > 0,
                F.least(
                    F.lit(bins - 1),
                    F.expr(f"(bits_micro DIV n_ngrams) DIV {width_micro}"),
                ).cast("int"),
            ).alias("ppl_bin"),
        )
    )
    hist = (
        binned.filter(F.col("ppl_bin").isNotNull())
        .groupBy(by, "ppl_bin")
        .agg(F.count("*").alias("_n"))
    )
    # tertile cut bins on the config-sized histogram: smallest bin
    # whose cumulative count reaches 1/3 (resp. 2/3) of the domain
    w_cum = Window.partitionBy(by).orderBy("ppl_bin")
    w_all = Window.partitionBy(by)
    c = hist.select(
        by,
        "ppl_bin",
        F.sum("_n").over(w_cum).alias("_cum"),
        F.sum("_n").over(w_all).alias("_tot"),
    )
    cuts = c.groupBy(by).agg(
        F.min(F.when(3 * F.col("_cum") >= F.col("_tot"), F.col("ppl_bin"))).alias(
            "_cut1"
        ),
        F.min(
            F.when(3 * F.col("_cum") >= 2 * F.col("_tot"), F.col("ppl_bin"))
        ).alias("_cut2"),
    )
    bucket = (
        F.when(F.col("ppl_bin").isNull(), F.lit("unscored"))
        .when(F.col("ppl_bin") <= F.col("_cut1"), F.lit("head"))
        .when(F.col("ppl_bin") <= F.col("_cut2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        binned.join(F.broadcast(cuts), by, "left")
        .select(
            id_col,
            by,
            F.col("n_ngrams"),
            "mb_per_ngram",
            "ppl_bin",
            bucket.alias("bucket"),
        )
    )


# Gopher rule-filter stop set (Rae et al. 2021, appendix A1.1: "contains
# at least two of the following English words": the, be, to, of, and,
# that, have, with).
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher quality-rule flags (Rae et al. 2021, appendix A1.1) — the
    per-rule boolean complement to the composite :func:`quality_score`
    and the n-gram-repetition half in :func:`repetition_scores`:

    - word count in [min_words, max_words]
    - mean word length in [3, 10] characters
    - symbol-to-word ratio <= 0.1 ('#' chars and '...' runs; the paper
      uses the unicode ellipsis — substituted with its ASCII spelling,
      and removes on STRICTLY greater, so exact-threshold docs keep)
    - <= 90% of lines start with a bullet ('- ' or '* ')
    - <= 30% of lines end with an ellipsis ('...')
    - >= 80% of words contain at least one alphabetic character
    - contains >= 2 distinct words from the paper's 8-word stop set

    ``keep`` is the conjunction. Every ratio threshold is evaluated as
    an exact integer cross-multiplication (10*n_sym < n_words,
    10*n_bullet < 9*n_lines, ...), so the flags are reproducible
    bit-for-bit by any engine — no float division anywhere. Words are
    whitespace-split (punctuation attached, per the paper's tokenizer-
    free reading); lines split on newline, empties kept.

    Scale shape: one codegen projection, zero shuffles, zero UDFs —
    the rules compose with `prep.curate`'s keep/drop gate as one more
    AND term over the same scan.
    """
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    lines = F.split(F.col(text_col), "\n", -1)
    n_words = F.size(words).cast("bigint")
    n_lines = F.size(lines).cast("bigint")
    # sum of word lengths == chars left after removing all whitespace
    word_chars = F.length(
        F.regexp_replace(F.col(text_col), r"\s+", "")
    ).cast("bigint")
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("bigint")
    n_hash = (
        F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit("#")))
    ).cast("bigint")
    # '...' occurrences: replace() removes non-overlapping runs left to
    # right in both Spark and DuckDB; each removal is exactly 3 chars
    n_ellipsis = (
        (
            F.length(text_col)
            - F.length(F.replace(F.col(text_col), F.lit("...")))
        )
        / 3
    ).cast("bigint")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("- ") | l.startswith("* "),
        )
    ).cast("bigint")
    n_ell_lines = F.size(
        F.filter(lines, lambda l: l.endswith("..."))
    ).cast("bigint")
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPS])
    tok = tokens(text_col)
    n_stops = F.size(
        F.filter(stops, lambda s: F.array_contains(tok, s))
    ).cast("bigint")

    ok_word_count = (n_words >= min_words) & (n_words <= max_words)
    ok_mean_word_len = (3 * n_words <= word_chars) & (
        word_chars <= 10 * n_words
    )
    # the paper REMOVES on strictly-greater ratios ("symbol-to-word
    # ratio greater than 0.1", ">90%" bullets, ">30%" ellipsis), so
    # docs sitting exactly on a threshold are KEPT — hence <=
    ok_symbol_ratio = 10 * (n_hash + n_ellipsis) <= n_words
    ok_bullet_lines = 10 * n_bullet <= 9 * n_lines
    ok_ellipsis_lines = 10 * n_ell_lines <= 3 * n_lines
    ok_alpha_words = 5 * n_alpha_words >= 4 * n_words
    ok_stopwords = n_stops >= 2
    keep = (
        ok_word_count
        & ok_mean_word_len
        & ok_symbol_ratio
        & ok_bullet_lines
        & ok_ellipsis_lines
        & ok_alpha_words
        & ok_stopwords
    )
    return df.select(
        id_col,
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        ok_word_count.alias("ok_word_count"),
        ok_mean_word_len.alias("ok_mean_word_len"),
        ok_symbol_ratio.alias("ok_symbol_ratio"),
        ok_bullet_lines.alias("ok_bullet_lines"),
        ok_ellipsis_lines.alias("ok_ellipsis_lines"),
        ok_alpha_words.alias("ok_alpha_words"),
        ok_stopwords.alias("ok_stopwords"),
        keep.alias("keep"),
    )


def lm_backoff_score(
    df: DataFrame,
    ref: DataFrame | None = None,
    n: int = 3,
    min_count: int = 2,
    alpha: float = 0.4,
    unk_prob: float = 1e-9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stupid-backoff n-gram scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation" — the web-scale distributed
    LM whose whole point was that an inexpensive count-ratio score with
    a constant backoff factor matches smoothed Kneser-Ney once counts
    come from enough data). Complements :func:`lm_perplexity`: the MLE
    table there scores a pruned-away or unseen n-gram at a flat unk
    floor, while backoff recovers a graded signal from the (n-1)- and
    unigram tiers:

        S(w3|w1 w2) = c(w1w2w3)/c(w1w2)        if c(w1w2w3) > 0
                    = alpha * c(w2w3)/c(w2)     elif c(w2w3) > 0
                    = alpha^2 * c(w3)/N         else (floored at unk)

    ``ref`` is the training corpus (defaults to ``df`` itself — the
    CCNet self-scoring setup). Bigram/trigram tables prune below
    ``min_count``; unigrams are kept whole (vocabulary-sized). Because
    every trigram occurrence contains its context bigram,
    c(w1w2) >= c(w1w2w3), so a surviving trigram's denominator is
    always present under equal pruning — no null denominators.

    Determinism contract: like lm_perplexity, each position's cost is
    quantized row-locally to integer micro-bits before the per-doc sum;
    the per-tier hit counts (n_tri/n_bi/n_uni) are exact integers.

    Scale shape: the corpus explodes once into trigram positions, then
    takes FOUR equi-joins — trigram table on the full gram, bigram
    table on the suffix bigram, unigram table on w2 and on w3. The
    count tables are pruned aggregates (orders of magnitude smaller
    than the corpus; the unigram table is vocabulary-sized and
    broadcast); hot grams skew the big joins and AQE splits them. One
    map-side-combined groupBy(doc) finishes. No driver-side state.
    """
    from .dedup import shingles

    if n != 3:
        # the tier tables and ngram context/suffix parsing below are
        # the trigram construction; a generic-order version would need
        # n-1 backoff tables, not a silently-wrong bigram join
        raise NotImplementedError(
            f"lm_backoff_score implements the trigram recursion (n=3), got n={n}"
        )
    ref = df if ref is None else ref
    rtoks = ref.select(tokens(text_col).alias("_w"))
    uni = (
        rtoks.select(F.explode("_w").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    # total token count: derived from the unigram table, not a second
    # corpus scan (the table is vocabulary-sized)
    uni = uni.transform(snapshot)
    total = uni.agg(F.sum("c1").alias("n_total"))
    # materialized once: the bigram table joins TWICE below (context
    # and suffix) with different pushed filters, which breaks
    # ReuseExchange and would re-scan + re-explode the corpus (the
    # ngram_lm lesson)
    bi = (
        rtoks.select(F.explode(shingles(F.col("_w"), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c2"))
        .filter(F.col("c2") >= min_count)
    ).transform(snapshot)
    tri = (
        rtoks.select(F.explode(shingles(F.col("_w"), n)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c3"))
        .filter(F.col("c3") >= min_count)
    )

    grams = df.select(F.col(id_col), tokens(text_col).alias("_w")).select(
        id_col, F.explode(shingles(F.col("_w"), n)).alias("ngram")
    )
    pos = grams.select(
        id_col,
        "ngram",
        F.substring_index("ngram", " ", n - 1).alias("_ctx"),
        F.substring_index("ngram", " ", -(n - 1)).alias("_suf"),
        F.substring_index(
            F.substring_index("ngram", " ", -(n - 1)), " ", 1
        ).alias("_w2"),
        F.substring_index("ngram", " ", -1).alias("_w3"),
    )
    j = (
        pos.join(tri.select(F.col("g").alias("ngram"), "c3"), "ngram", "left")
        .join(
            bi.select(F.col("g").alias("_suf"), F.col("c2").alias("c_suf")),
            "_suf",
            "left",
        )
        .join(
            bi.select(F.col("g").alias("_ctx"), F.col("c2").alias("c_ctx")),
            "_ctx",
            "left",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("_w2"), F.col("c1").alias("c_w2"))),
            "_w2",
            "left",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("_w3"), F.col("c1").alias("c_w3"))),
            "_w3",
            "left",
        )
        .crossJoin(F.broadcast(total))
    )
    a = F.lit(float(alpha))
    p = (
        F.when(F.col("c3").isNotNull(), F.col("c3") / F.col("c_ctx"))
        .when(
            F.col("c_suf").isNotNull(),
            a * F.col("c_suf") / F.col("c_w2"),
        )
        .otherwise(
            a * a * F.coalesce(F.col("c_w3"), F.lit(0)) / F.col("n_total")
        )
    )
    tier = (
        F.when(F.col("c3").isNotNull(), F.lit("tri"))
        .when(F.col("c_suf").isNotNull(), F.lit("bi"))
        .otherwise(F.lit("uni"))
    )
    scored = j.select(
        id_col,
        F.round(
            -F.log2(F.greatest(p, F.lit(float(unk_prob)))) * F.lit(1e6)
        )
        .cast("bigint")
        .alias("_bm"),
        tier.alias("_tier"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_ngrams"),
        F.sum(F.when(F.col("_tier") == "tri", 1).otherwise(0)).alias("n_tri"),
        F.sum(F.when(F.col("_tier") == "bi", 1).otherwise(0)).alias("n_bi"),
        F.sum(F.when(F.col("_tier") == "uni", 1).otherwise(0)).alias("n_uni"),
        F.sum("_bm").alias("bits_micro"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).cast("bigint").alias("n_ngrams"),
            F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_tri"),
            F.coalesce("n_bi", F.lit(0)).cast("bigint").alias("n_bi"),
            F.coalesce("n_uni", F.lit(0)).cast("bigint").alias("n_uni"),
            F.coalesce("bits_micro", F.lit(0)).cast("bigint").alias("bits_micro"),
        )
    )


def hashed_components(
    df: DataFrame,
    dim: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "emb-v1",
) -> DataFrame:
    """Sparse signed feature-hashing components of a text column — the
    (id, bucket, val) inverted-index form of :func:`hashed_embedding`
    (Weinberger et al. 2009 hashing trick, signed variant): each token
    hashes to a bucket b = md5[0:4] mod ``dim`` with sign ±1 from
    md5[4], and val(id, b) = Σ signs. Exact BIGINT everywhere.
    Components with val = 0 (signs cancelled) are dropped — they carry
    nothing through either the dense vector or a sparse dot product.

    Scale shape: explode → one map-side-combined groupBy(id, bucket).
    This sparse form is the one to JOIN on (see
    ``similarity.sparse_dot_topk``); densify only at the edge.
    """
    h = F.md5(F.concat_ws("#", F.col("_tok"), F.lit(salt)))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % dim
    sign = 1 - 2 * (F.conv(F.substring(h, 5, 1), 16, 10).cast("bigint") % 2)
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_tok"))
        .select(id_col, bucket.alias("bucket"), sign.alias("_sgn"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("_sgn").alias("val"))
        .filter(F.col("val") != 0)
    )


def hashed_embedding(
    df: DataFrame,
    dim: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "emb-v1",
) -> DataFrame:
    """Dense hashed text embedding: the ``dim``-wide BIGINT vector form
    of :func:`hashed_components` — the bridge from the text corpus to
    every embedding-side op (ANN top-k, PCA, JL, semdedup) when no
    model-produced embedding column exists. Deterministic, integer-
    exact, and engine-portable (md5 arithmetic only).

    Output: (id, vec array<bigint>, nnz, norm_sq). Zero-token and
    null-text docs keep an all-zero vector (left join back onto the
    input ids — never silently dropped).

    Scale shape: one groupBy(id) assembling ≤ ``dim`` map entries per
    doc on top of the components' groupBy — the dense row is built
    exactly once, after all reduction. No UDFs; map lookup + transform
    are codegen.
    """
    comp = hashed_components(df, dim, id_col, text_col, salt)
    maps = comp.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("val")))
        ).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("bigint")), F.lit(0).cast("bigint")
        ),
    )
    zero = F.lit(0).cast("bigint")
    return (
        df.select(id_col)
        .join(maps, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                vec, F.array_repeat(zero, dim)
            ).alias("vec"),
        )
        .select(
            id_col,
            "vec",
            F.size(F.filter("vec", lambda x: x != 0)).cast("bigint").alias("nnz"),
            F.aggregate(
                "vec", zero, lambda acc, x: acc + x * x
            ).alias("norm_sq"),
        )
    )


def ranking_auc(
    df: DataFrame,
    score_col: str = "score_u",
    label_col: str = "label",
    block: int = 1 << 16,
) -> DataFrame:
    """Exact distributed ROC-AUC via the Mann-Whitney rank-sum identity
    — the evaluation half of the classifier loop (train →
    :func:`train_linear_classifier`, infer → :func:`classifier_score`,
    evaluate → here). AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻),
    so over per-distinct-score class counts (pos_s, neg_s):

        num×2 = Σ_s pos_s · (2·cumneg_lt(s) + neg_s)
        AUC   = num×2 / (2 · n_pos · n_neg)

    All counting is BIGINT — ties contribute exact halves because the
    numerator is kept doubled — so the result is bit-reproducible
    across engines and partitionings (``score_col`` must be integral).

    Scale shape (the two-level cumulative-sum pattern, cf.
    ``two_level_topk``): a naive ``sum OVER (ORDER BY score)`` is ONE
    task holding every distinct score. Instead (1) map-side-combined
    groupBy(score) collapses the corpus to distinct-score rows;
    (2) block-level neg totals (floor-div ``block``) get their running
    offsets in a window over #blocks rows (config-sized); (3) the
    within-block cumulative runs partitioned BY block — parallel,
    partition-bounded. One row out: (n_pos, n_neg, auc_num_x2,
    auc_micro, auc).
    """
    s = F.col(score_col).cast("bigint")
    is_pos = F.col(label_col).cast("boolean")
    g = (
        df.select(s.alias("_s"), is_pos.alias("_p"))
        .groupBy("_s")
        .agg(
            F.sum(F.when(F.col("_p"), 1).otherwise(0)).alias("_pos"),
            F.sum(F.when(F.col("_p"), 0).otherwise(1)).alias("_neg"),
        )
        # distinct-score table feeds BOTH the block offsets and the
        # within-block cumulative: snapshot it (it is corpus-reduction
        # output, small) so the corpus is scanned and shuffled ONCE.
        .transform(snapshot)
    )
    # floor-div block id (pmod keeps it exact for negative scores)
    blk_of = ((F.col("_s") - F.pmod(F.col("_s"), F.lit(block))) / block).cast(
        "bigint"
    )
    g = g.withColumn("_blk", blk_of)
    w_blk = (
        Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    )  # one row per block: config-sized single-partition window
    blk = (
        g.groupBy("_blk")
        .agg(F.sum("_neg").alias("_bneg"))
        .withColumn("_off", F.coalesce(F.sum("_bneg").over(w_blk), F.lit(0)))
        .drop("_bneg")
    )
    w_in = (
        Window.partitionBy("_blk")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        g.join(F.broadcast(blk), "_blk")
        .withColumn(
            "_cumneg",
            F.col("_off") + F.coalesce(F.sum("_neg").over(w_in), F.lit(0)),
        )
    )
    tot = cum.agg(
        F.sum("_pos").cast("bigint").alias("n_pos"),
        F.sum("_neg").cast("bigint").alias("n_neg"),
        F.sum(
            F.col("_pos") * (F.lit(2) * F.col("_cumneg") + F.col("_neg"))
        )
        .cast("bigint")
        .alias("auc_num_x2"),
    )
    pairs_x2 = F.lit(2) * F.col("n_pos") * F.col("n_neg")
    num = F.col("auc_num_x2")
    auc_micro = F.when(
        pairs_x2 > 0,
        (
            (num * 1_000_000 - F.pmod(num * 1_000_000, pairs_x2)) / pairs_x2
        ).cast("bigint"),
    )
    return tot.select(
        "n_pos",
        "n_neg",
        "auc_num_x2",
        auc_micro.alias("auc_micro"),
        F.when(pairs_x2 > 0, F.round(num / pairs_x2, 6)).alias("auc"),
    )


# Latin accent fold table for normalize_text (fixed, portable: Spark
# translate() and DuckDB translate() treat both strings as parallel
# per-character maps).
ACCENT_SRC = "áàâäãåéèêëíìîïóòôöõúùûüýÿñç"
ACCENT_DST = "aaaaaaeeeeiiiiooooouuuuyync"


def normalize_text(
    df: DataFrame,
    strip_punct: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style text normalization (Wenzek et al. 2019 §4.1 — the
    canonical form documents are HASHED in before dedup, so trivially
    different renderings of the same page collapse): lowercase, fold
    common Latin accents, map every digit to 0, optionally strip
    punctuation, collapse whitespace runs. Emits the normal form and
    its md5 (``norm_hash``) so it composes directly with exact_dedup's
    groupBy-on-hash shape.

    One codegen projection — zero shuffles, zero UDFs; byte-identical
    in DuckDB (same translate table, same RE2∩Java regex subset).
    """
    t = F.translate(F.lower(F.col(text_col)), ACCENT_SRC, ACCENT_DST)
    t = F.regexp_replace(t, "[0-9]", "0")
    if strip_punct:
        t = F.regexp_replace(t, "[^a-z0-9 \t\n]", " ")
    t = F.trim(F.regexp_replace(t, "\\s+", " "))
    return df.select(
        id_col,
        t.alias("norm_text"),
        F.md5(t).alias("norm_hash"),
    )


def _clf_bucket(tok_col, dim: int, salt: str):
    """Feature bucket of a token: first-4-hex md5(token '#' salt) mod
    dim. DuckDB-identical:
    ('0x'||substr(md5(t||'#'||salt),1,4))::BIGINT % dim."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("#", tok_col, F.lit(salt))), 1, 4),
            16, 10,
        ).cast("bigint")
        % dim
    )


def train_linear_classifier(
    df: DataFrame,
    label_col: str = "label",
    iters: int = 3,
    dim: int = 64,
    lr_num: int = 1,
    lr_den: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "clf-train-v1",
) -> DataFrame:
    """Distributed training of the hashed linear quality classifier —
    the training half of :func:`classifier_score` (which only infers).
    Full-batch gradient descent with a HARD sigmoid
    p = clamp(1/2 + margin/4, 0, 1) (Hinton-style piecewise-linear
    logistic): the hard sigmoid is the point, not a shortcut — its
    gradient arithmetic is EXACT in scaled integers (micro-units,
    floor-div by shift), so training is bit-reproducible across
    engines and partitionings, where true-sigmoid training would drift
    per-libm. fastText's hashing trick maps tokens to ``dim`` buckets
    (+ one bias bucket at index ``dim``).

    Per iteration (all integer micro-unit arithmetic):
        margin_u(doc) = Σ_b w_u[b] · x_b
        p_u = clamp(500000 + (margin_u >> 2), 0, 1e6)
        err_u = p_u - y·1e6
        g_u[b] = floor(Σ_docs err_u · x_b / n_docs)
        w_u[b] -= floor(g_u[b] · lr_num / lr_den)

    Scale shape: the (doc, bucket, count) feature table is built ONCE
    and snapshotted (every iteration reuses it — the k-means lesson);
    each iteration is one broadcast join of the config-sized weight
    table (dim+1 rows) + one map-side-combined groupBy(doc) + one
    groupBy(bucket) gradient agg. The per-iteration driver collect is
    dim+1 rows — model state, not data (the make_anchors precedent).
    Returns (bucket, weight_micro, weight).
    """
    tok = tokens(text_col)
    feats = (
        df.select(
            F.col(id_col),
            (F.col(label_col).cast("int").cast("bigint") * 1_000_000).alias("_y_u"),
            F.explode(
                F.concat(
                    F.transform(tok, lambda t: _clf_bucket(t, dim, salt)),
                    F.array(F.lit(dim).cast("bigint")),  # bias bucket
                )
            ).alias("_b"),
        )
        .groupBy(id_col, "_y_u", "_b")
        .agg(F.count("*").alias("_x"))
    ).transform(snapshot)  # reused every iteration: never recompute the corpus scan
    n_docs = df.count()
    spark = df.sparkSession

    w = {b: 0 for b in range(dim + 1)}
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(b, wu) for b, wu in w.items()], "_b bigint, _w_u bigint"
        )
        margins = (
            feats.join(F.broadcast(wdf), "_b")
            .groupBy(id_col, "_y_u")
            .agg(F.sum(F.col("_w_u") * F.col("_x")).alias("_m_u"))
        )
        err = margins.select(
            id_col,
            (
                F.greatest(
                    F.lit(0).cast("bigint"),
                    F.least(
                        F.lit(1_000_000).cast("bigint"),
                        F.lit(500_000) + F.shiftright(F.col("_m_u"), 2),
                    ),
                )
                - F.col("_y_u")
            ).alias("_e_u"),
        )
        gsum = (
            feats.join(err, id_col)
            .groupBy("_b")
            .agg(F.sum(F.col("_e_u") * F.col("_x")).alias("_g_sum"))
        )
        # floor-div via pmod (DuckDB // truncates toward zero; this is
        # exact floor in both engines)
        def _fdiv(a, b: int):
            d = F.lit(b).cast("bigint")
            return ((a - F.pmod(a, d)) / d).cast("bigint")

        g_u = _fdiv(F.col("_g_sum"), n_docs)
        step = gsum.select("_b", _fdiv(g_u * lr_num, lr_den).alias("_step"))
        for row in step.collect():  # dim+1 rows: model state, not data
            w[row["_b"]] = w[row["_b"]] - row["_step"]

    out = spark.createDataFrame(
        sorted((int(b), int(wu)) for b, wu in w.items()),
        "bucket bigint, weight_micro bigint",
    )
    return out.select(
        "bucket", "weight_micro", (F.col("weight_micro") / 1e6).alias("weight")
    )


def pair_lift(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    k: int = 50,
) -> DataFrame:
    """Adjacent-token association mining — the integer-exact PMI
    analog (collocation discovery, the distributional-similarity prep
    step word2vec/GloVe pipelines run before training).

    PMI = log( p(xy) / (p(x) p(y)) ) is a monotone transform of the
    LIFT c_xy * N / (c_x * c_y); ranking by lift needs no log at all,
    so the whole operator stays in BIGINT — no libm, bit-identical
    across engines. The division is staged to keep every intermediate
    inside int64 at 10^12 tokens:

        t1 = (c_xy * 1e6) DIV c_x      (<= 1e6 always: c_xy <= c_x)
        lift_micro = (t1 * N) DIV c_y  (<= 1e6 * N — fits to N ~ 9e12)

    The staged floor semantics are the DEFINED result (documented,
    mirrored by the oracle) — a single-expression rational would
    overflow first.

    Plan shape: one explode for unigram counts (map-side combined),
    one transform+explode for adjacent pairs, min-support filter
    BEFORE the two vocab joins (pairs above support are a sliver of
    all pairs), unigram joins on token (vocabulary-sized, scales with
    corpus -> unhinted, AQE's skew join splits stopword-hot tokens),
    total-token count as a one-row broadcast, final top-k via the
    shared two-level pattern."""
    toks = df.select(tokens(text_col).alias("w"))
    uni = (
        toks.select(F.explode("w").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c_tok"))
    )
    total = uni.agg(F.sum("c_tok").alias("n_total"))
    pairs = (
        toks.filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(0, size(w)-2),"
                       " i -> struct(w[i] AS x, w[i+1] AS y))")
            ).alias("p")
        )
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    ux = uni.select(F.col("token").alias("_xt"), F.col("c_tok").alias("x_count"))
    uy = uni.select(F.col("token").alias("_yt"), F.col("c_tok").alias("y_count"))
    scored = (
        pairs.join(ux, F.col("x") == F.col("_xt"))
        .join(uy, F.col("y") == F.col("_yt"))
        .join(F.broadcast(total))
        .withColumn(
            "lift_micro",
            F.expr("((pair_count * 1000000) DIV x_count) * n_total DIV y_count"),
        )
        .select("x", "y", "pair_count", "x_count", "y_count", "lift_micro")
    )
    return two_level_topk(
        scored,
        group_cols=[],
        order_cols=[F.col("lift_micro").desc(), F.col("x").asc(), F.col("y").asc()],
        k=k,
    )
