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
moves. Rank lineage is cut per round (localCheckpoint) so the plan
doesn't grow with the iteration count; nothing ever reaches the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    e = e.repartition("src").localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
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
            .localCheckpoint(eager=True)
        )

    return state.select("node", "rank_micro")
