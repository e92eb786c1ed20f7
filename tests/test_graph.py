"""Exact-integer PageRank goldens (functions/graph.py) — hand-computed
fixed-point values, dangling/sink semantics, and plan hygiene."""

from __future__ import annotations

import pytest

from otel2pv_spark.functions import graph as gr


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_golden_two_rounds(spark):
    """1->{2,3}, 2->3, 3->1; every value hand-derived with the floor
    arithmetic (see module docstring)."""
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 1)])
    got = {r.node: r.rank_micro for r in gr.pagerank(e, iters=2).collect()}
    assert got == {1: 1_361_250, 2: 575_000, 3: 1_063_750}


def test_pagerank_dangling_and_no_inbound(spark):
    """A sink (2) donates nothing onward; a source (1) with no inbound
    settles at the base (1-d) mass."""
    e = _edges(spark, [(1, 2)])
    got = {r.node: r.rank_micro for r in gr.pagerank(e, iters=1).collect()}
    assert got == {1: 150_000, 2: 1_000_000}
    got2 = {r.node: r.rank_micro for r in gr.pagerank(e, iters=2).collect()}
    # round 2: node 1 again gets only base; node 2 receives 1's 150000
    assert got2 == {1: 150_000, 2: 150_000 + 850_000 * 150_000 // 1_000_000}


def test_pagerank_zero_iters_and_duplicate_edges(spark):
    """iters=0 returns the uniform start; duplicate edge rows collapse
    (distinct edge set), so they don't double a share."""
    e = _edges(spark, [(1, 2), (1, 2), (2, 1)])
    got = {r.node: r.rank_micro for r in gr.pagerank(e, iters=0).collect()}
    assert got == {1: 1_000_000, 2: 1_000_000}
    one = {r.node: r.rank_micro for r in gr.pagerank(e, iters=1).collect()}
    # dedup -> both degree 1, symmetric exchange: both stay at 1.0
    assert one == {1: 1_000_000, 2: 1_000_000}


def test_pagerank_validates_params(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        gr.pagerank(e, iters=-1)
    with pytest.raises(ValueError):
        gr.pagerank(e, damping_ppm=2_000_000)


def test_triangle_counts_golden(spark):
    """Canonicalization (reverse dup + self-loop) and per-corner
    attribution: two triangles sharing edge 1-2."""
    from otel2pv_spark.functions.graph import triangle_counts

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 1), (2, 2), (4, 1), (4, 2)],
        "src long, dst long",
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_counts_no_triangles(spark):
    """A path graph has none — empty output, not zero rows per node."""
    from otel2pv_spark.functions.graph import triangle_counts

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert triangle_counts(edges).count() == 0
