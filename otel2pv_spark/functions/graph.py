"""Iterative graph computation — exact-integer PageRank.

Why it's here: web-scale corpus curation ranks hosts/domains by link
structure before sampling (Common Crawl publishes harmonic-centrality /
PageRank host rankings; CCNet and RefinedWeb both consume such
rankings as quality priors). The engine therefore needs the iterative
join-aggregate plan shape, not just one-shot queries. The repo's other
iterative op (dedup.connected_components) converges by fixpoint; this
one runs a FIXED iteration count — the common production form (rank
deltas below noise after ~10 rounds).

Determinism doctrine (same as classifier training): every arithmetic
step is BIGINT with floor division, so the result is bit-identical
across engines, partitionings and parallelism levels, and the DuckDB
oracle can replay it exactly — a float PageRank differs in the last
ulp per reduction order. Rank carries 1e6 = 1.0:

    share(e)      = rank_micro(src) DIV out_degree(src)
    rank'(n)      = (1e6 - d_ppm) + d_ppm * SUM shares(n) DIV 1e6

Floor-division mass loss (< out_degree ulps per node per round) and
dangling-node mass loss (classic simplified variant: sinks donate
nothing) are part of the defined semantics, replicated by the oracle.

Scale shape per iteration: ONE equi-join (ranks ⋈ edges ON src) + ONE
map-side-combined groupBy(dst) + a left join back onto the node set
for no-inbound nodes. The edge table — the corpus-scale side — is
hash-partitioned on src ONCE and checkpointed; every iteration's join
then reuses that layout and only the rank table (one row per node)
moves. Rank lineage is cut per round (snapshot(), reliable-switchable) so the plan
doesn't grow with the iteration count; nothing ever reaches the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..snapshot import snapshot


MICRO = 1_000_000


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping_ppm: int = 850_000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration exact-integer PageRank over a distinct edge set.

    Returns (node, rank_micro) for every node appearing as src or dst.
    ``damping_ppm``: damping factor in parts-per-million (850000 =
    the canonical 0.85).
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not 0 <= damping_ppm <= MICRO:
        raise ValueError("damping_ppm must be within [0, 1e6]")
    base = MICRO - damping_ppm

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    # pay the src shuffle once; every iteration's join reuses it
    e = e.repartition("src").transform(snapshot)

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(snapshot)
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    # degree rides WITH the rank row so the per-iteration join needs no
    # third table: (node, rank, deg-if-any)
    state = nodes.join(
        out_deg, nodes["node"] == out_deg["src"], "left"
    ).select("node", F.lit(int(MICRO)).alias("rank_micro"), "_deg")

    for _ in range(iters):
        shares = (
            state.filter(F.col("_deg").isNotNull())
            .join(e, state["node"] == e["src"])
            .select("dst", F.expr("rank_micro DIV _deg").alias("_share"))
            .groupBy("dst")
            .agg(F.sum("_share").alias("_in"))
        )
        state = (
            state.join(shares, state["node"] == shares["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"CAST({damping_ppm} AS BIGINT)"
                        f" * coalesce(_in, CAST(0 AS BIGINT)) DIV {MICRO}"
                    )
                ).cast("bigint").alias("rank_micro"),
                "_deg",
            )
            .transform(snapshot)
        )

    return state.select("node", "rank_micro")


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation —
    the MapReduce-classic skew-proof construction (Suri & Vassilvitskii
    WWW'11 "Counting Triangles and the Curse of the Last Reducer").

    Input is an arbitrary directed/multi edge list; self-loops drop and
    parallel/reverse duplicates collapse to ONE undirected edge first
    (a triangle is a property of the simple graph). Each undirected
    edge is then oriented from its (degree, id)-SMALLER endpoint toward
    the larger:

        u -> v   iff   (deg(u), u) < (deg(v), v)

    which caps every node's out-degree at O(sqrt(m)) — the wedge
    self-join that enumerates candidate (v, w) pairs per source is
    bounded by sum(outdeg^2) <= m^1.5 instead of the unbounded
    sum(deg^2) a celebrity node would cause (the "last reducer" this
    construction kills: a 10^8-degree hub contributes ZERO wedges as a
    source because every edge points INTO it).

    Plan: two groupBys (canonical edges, degrees), one degree join per
    endpoint, one wedge self-join on the oriented source, one closing
    equi-join against the oriented edges, one explode(3)+groupBy to
    attribute each triangle to its corners. Everything equi-keyed —
    AQE handles residual skew; nothing reaches the driver."""
    # canonical undirected edge set: (a < b), loops out, dups collapsed
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("n").alias("_na"), F.col("deg").alias("_da"))
    db = deg.select(F.col("n").alias("_nb"), F.col("deg").alias("_db"))
    keyed = (
        und.join(da, F.col("a") == F.col("_na"))
        .join(db, F.col("b") == F.col("_nb"))
        .select(
            "a", "b",
            F.struct(F.col("_da").alias("d"), F.col("a").alias("i")).alias("ka"),
            F.struct(F.col("_db").alias("d"), F.col("b").alias("i")).alias("kb"),
        )
    )
    oriented = keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("kv"),
    )
    e1 = oriented.select(F.col("u").alias("_s"), F.col("v").alias("_v1"),
                         F.col("kv").alias("_k1"))
    e2 = oriented.select(F.col("u").alias("_s"), F.col("v").alias("_v2"),
                         F.col("kv").alias("_k2"))
    wedges = e1.join(e2, "_s").filter(F.col("_k1") < F.col("_k2")).select(
        F.col("_s").alias("tu"), F.col("_v1").alias("tv"), F.col("_v2").alias("tw")
    )
    closing = oriented.select(F.col("u").alias("tv"), F.col("v").alias("tw"))
    tris = wedges.join(closing, ["tv", "tw"])
    return (
        tris.select(F.explode(F.array("tu", "tv", "tw")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
