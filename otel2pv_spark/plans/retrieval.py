"""End-to-end retrieval-index plan over a documents table — the
serving-side counterpart of ``plans/curation.py``'s training-side DAG:

    chunk (fixed-token windows) → BM25 inverted index (postings +
    corpus stats) → committed index tables → query serving
    (index probe recall → cross-encoder rerank).

Why a committed plan and not just the operators: at 100 TB the index
BUILD is the corpus-scale job you run once per snapshot (chunking and
posting aggregation each scan the text exactly once), while QUERY
serving must never re-read the corpus — it probes the term-pruned
posting table and joins chunk text only for the |Q| x recall_k rerank
pairs. Committing chunks/postings/stats through the same Catalog /
RunManifest machinery as the pipeline gives the build atomic swaps and
crash-resume by step, and gives serving a stable snapshot to probe.

Scale shape by stage: chunking is a pure projection (explode of
per-doc chunk structs — no shuffle); the posting build is ONE
map-side-combined groupBy(term, chunk); stats is a one-row aggregate;
a query batch filters postings with an isin over its terms (partition
prunes on a term-partitioned index), scores on posting-sized data,
takes top-recall_k per query, and reranks exactly |Q| x recall_k
Arrow-batched pairs. Chunk ids pack (doc_id, chunk_idx) into one
BIGINT — overflow-guarded, see ``CHUNKS_PER_DOC``.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import prep
from ..functions import rerank as rr
from ..functions import textstats as ts
from ..sources.catalog import Catalog
from ..sources.manifest import RunManifest

# chunk_uid = doc_id * CHUNKS_PER_DOC + chunk_idx. 2^63 / 1000 leaves
# room for doc ids up to ~9.2e15; the build validates the chunk_idx
# bound instead of silently colliding.
CHUNKS_PER_DOC = 1000


@dataclass
class RetrievalConfig:
    out_root: str = "/tmp/otel2pv_retrieval"
    run_id: str | None = None
    chunk_tokens: int = 64
    overlap: int = 16
    recall_k: int = 20
    final_k: int = 5


def build_chunks(docs: DataFrame, cfg: RetrievalConfig) -> DataFrame:
    """(chunk_uid, doc_id, chunk_idx, chunk_text) — fixed-token chunk
    windows with the packed BIGINT chunk id the index keys on."""
    chunks = prep.chunk_documents(
        docs, chunk_tokens=cfg.chunk_tokens, overlap=cfg.overlap
    )
    # fail loudly on id-packing overflow rather than colliding: a doc
    # would need > CHUNKS_PER_DOC * stride tokens (~48k at defaults),
    # and doc_id itself must fit the packed range — Spark's default
    # non-ANSI bigint arithmetic wraps silently, so BOTH operands are
    # guarded (a negative or > 2^63/CHUNKS_PER_DOC doc_id would
    # otherwise collide exactly as the comment above promises it can't)
    max_doc_id = (2**63 - 1) // CHUNKS_PER_DOC
    guarded = chunks.withColumn(
        "chunk_uid",
        F.when(
            (F.col("chunk_idx") < CHUNKS_PER_DOC)
            & (F.col("doc_id") >= 0)
            & (F.col("doc_id") < max_doc_id),
            F.col("doc_id") * CHUNKS_PER_DOC + F.col("chunk_idx"),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("chunk_uid packing overflow: chunk_idx "),
                    F.col("chunk_idx").cast("string"),
                    F.lit(f" (cap {CHUNKS_PER_DOC}) doc_id "),
                    F.col("doc_id").cast("string"),
                    F.lit(f" (range [0, {max_doc_id}))"),
                )
            )
        ),
    )
    return guarded.select("chunk_uid", "doc_id", "chunk_idx", "chunk_text")


def run_index(spark: SparkSession, docs: DataFrame, cfg: RetrievalConfig) -> dict:
    """Build and COMMIT the retrieval index: chunks, postings, stats.
    Resumable per step via the run manifest (a crash between commits
    re-runs only the missing steps on restart)."""
    run_id = cfg.run_id or uuid.uuid4().hex[:12]
    cat = Catalog(spark, cfg.out_root)
    man = RunManifest(cfg.out_root, f"ridx-{run_id}")
    t0 = time.time()

    if not man.is_committed("chunks"):
        cat.write(build_chunks(docs, cfg), "chunks")
        man.commit("chunks")
    if not (man.is_committed("postings") and man.is_committed("stats")):
        postings, stats = ts.bm25_index(
            cat.read("chunks"), id_col="chunk_uid", text_col="chunk_text"
        )
        if not man.is_committed("postings"):
            cat.write(postings, "postings")
            man.commit("postings")
        if not man.is_committed("stats"):
            cat.write(stats, "stats")
            man.commit("stats")
    return {
        "run_id": run_id,
        "chunks": cat.read("chunks").count(),
        "postings": cat.read("postings").count(),
        "wall_sec": time.time() - t0,
        "committed": man.committed_steps(),
    }


def query_index(
    spark: SparkSession,
    cfg: RetrievalConfig,
    queries: list[tuple[str, str]],
) -> DataFrame:
    """Serve a query batch from the COMMITTED index: BM25 recall from
    the posting probe (corpus text never read), then the Arrow-batched
    cross-encoder rerank over exactly |Q| x recall_k chunk texts.
    Returns (query_id, chunk_uid, ce_score, rank<=final_k)."""
    cat = Catalog(spark, cfg.out_root)
    recall = ts.bm25_topk_from_index(
        cat.read("postings"),
        cat.read("stats"),
        queries,
        k=cfg.recall_k,
        id_col="chunk_uid",
    )
    chunks = cat.read("chunks")
    return rr.crossencoder_rerank(
        chunks,
        queries,
        recall,
        k=cfg.final_k,
        id_col="chunk_uid",
        text_col="chunk_text",
    )
