"""Retrieval-index plan (plans/retrieval.py): committed chunk/posting/
stats tables, query serving off the index only, crash-resume, and
equality with the lazy chain the driver query oracle-checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import table_mtime_fingerprint
from otel2pv_spark.entry_queries import BM25_QUERIES, _docs
from otel2pv_spark.functions import rerank as rr
from otel2pv_spark.functions import textstats as ts
from otel2pv_spark.plans import retrieval as rtr


def _results(df):
    return sorted(
        (r.query_id, r.chunk_uid, r.ce_score, r.rank) for r in df.collect()
    )


def test_index_build_query_matches_lazy_chain(spark, sf_dir, tmp_path):
    """Serving from the committed index == running the chain lazily."""
    docs = _docs(spark, sf_dir)
    cfg = rtr.RetrievalConfig(out_root=str(tmp_path / "ridx"), run_id="r1")
    res = rtr.run_index(spark, docs, cfg)
    assert set(res["committed"]) == {"chunks", "postings", "stats"}
    assert res["chunks"] > 0 and res["postings"] > 0

    served = rtr.query_index(spark, cfg, BM25_QUERIES)

    chunks = rtr.build_chunks(docs, cfg)
    postings, stats = ts.bm25_index(
        chunks, id_col="chunk_uid", text_col="chunk_text"
    )
    recall = ts.bm25_topk_from_index(
        postings, stats, BM25_QUERIES, k=cfg.recall_k, id_col="chunk_uid"
    )
    lazy = rr.crossencoder_rerank(
        chunks, BM25_QUERIES, recall, k=cfg.final_k,
        id_col="chunk_uid", text_col="chunk_text",
    )
    assert _results(served) == _results(lazy)
    # rank contract: contiguous 1..k per query
    per_q = {}
    for qid, _, _, rank in _results(served):
        per_q.setdefault(qid, []).append(rank)
    for qid, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_index_resume_skips_committed_steps(spark, sf_dir, tmp_path):
    """A re-run with the same run_id resumes from the manifest: no
    step recomputes (table mtimes unchanged), same counts."""
    import os

    docs = _docs(spark, sf_dir)
    cfg = rtr.RetrievalConfig(out_root=str(tmp_path / "ridx2"), run_id="r2")
    first = rtr.run_index(spark, docs, cfg)
    root = str(tmp_path / "ridx2")
    before = table_mtime_fingerprint(spark, root, "postings")
    second = rtr.run_index(spark, docs, cfg)
    assert table_mtime_fingerprint(spark, root, "postings") == before
    assert second["chunks"] == first["chunks"]
    assert second["postings"] == first["postings"]


def test_chunk_uid_overflow_raises(spark):
    """A doc long enough to exceed CHUNKS_PER_DOC chunks fails loudly
    instead of colliding packed ids."""
    long_doc = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(49 * 1000 + 200)))],
        "doc_id long, text string",
    )
    cfg = rtr.RetrievalConfig(chunk_tokens=2, overlap=1)  # stride 1
    with pytest.raises(Exception, match="chunk_uid packing overflow"):
        # NB .count() would column-prune chunk_uid and never evaluate
        # the guard — force the column itself
        rtr.build_chunks(long_doc, cfg).select("chunk_uid").collect()


def test_chunk_uid_doc_id_range_guard(spark):
    """A doc_id outside [0, 2^63/CHUNKS_PER_DOC) would wrap the packed
    bigint under non-ANSI arithmetic and silently collide — both a
    negative id and an over-range id must raise instead."""
    for bad_id in (-1, (2**63 - 1) // rtr.CHUNKS_PER_DOC + 1):
        bad = spark.createDataFrame(
            [(bad_id, "alpha beta gamma delta")], "doc_id long, text string"
        )
        cfg = rtr.RetrievalConfig(chunk_tokens=2, overlap=0)
        with pytest.raises(Exception, match="chunk_uid packing overflow"):
            rtr.build_chunks(bad, cfg).select("chunk_uid").collect()
