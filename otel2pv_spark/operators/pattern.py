"""Sequential pattern matching over ordered per-key event streams.

Two CEP-style operators a log pipeline runs over sequenced output (the
MATCH_RECOGNIZE / funnel-analysis pair):

- ``match_steps``: CONTIGUOUS pattern — k consecutive rows (by the
  per-key order) satisfying predicates p1..pk. Pure lead() windows over
  the key partition: the conv_id exchange is the same one every other
  sequencing window uses, zero extra shuffles when chained after them.
- ``funnel``: NON-CONTIGUOUS first-reach funnel — the earliest order
  value at which each step is satisfied strictly after the previous
  step's first satisfaction. Staged filtered min-aggregations joined on
  the key: each stage filters the (small) set of step-i candidate rows
  before the join, all stages hash-partition on the same key so AQE
  collapses them onto one exchange; no per-key arrays are ever
  collected, so a 10^7-turn hot conversation costs the same per row as
  a 12-turn one.

The reference's GroupAndVerify validates STRUCTURE (tree balance);
these validate ORDER SEMANTICS (did the expected role/event sequence
actually occur) — the complementary behavioral check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_col(pred: Column | str) -> Column:
    return F.expr(pred) if isinstance(pred, str) else pred


def match_steps(
    df: DataFrame,
    steps: list[Column | str],
    by: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Rows starting a run of len(steps) CONSECUTIVE rows (per ``by``,
    ordered by ``order_col``) that satisfy steps[0], steps[1], ... in
    order. Returns (by, order_col aliased match_start, match_end).

    Consecutive means adjacent in the ordered stream (the row and its
    next lead(1), lead(2), ...), not adjacent order values — gaps in
    ``order_col`` numbering do not break a match, missing rows do.
    """
    if not steps:
        raise ValueError("match_steps: need at least one step predicate")
    w = Window.partitionBy(by).orderBy(order_col)
    cond = _as_col(steps[0])
    for i, p in enumerate(steps[1:], start=1):
        cond = cond & F.coalesce(
            F.lead(_as_col(p), i).over(w), F.lit(False)
        )
    end = F.lead(F.col(order_col), len(steps) - 1).over(w)
    return (
        df.select(
            by,
            F.col(order_col),
            cond.alias("_m"),
            end.alias("_end"),
        )
        .filter(F.col("_m"))
        .select(
            by,
            F.col(order_col).alias("match_start"),
            F.col("_end").alias("match_end"),
        )
    )


def funnel(
    df: DataFrame,
    steps: list[Column | str],
    by: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """First-reach funnel: per key, the earliest ``order_col`` at which
    step i holds STRICTLY AFTER step i-1 first held. Returns one row
    per key that reached step 1: (by, step_1..step_k nullable orders,
    reached = number of steps attained).

    Scale shape: stage i is filter(step_i) → join on ``by`` against the
    stage-(i-1) table → groupBy(by).min — every stage shuffles only
    step-i candidate rows plus the one-row-per-key frontier, all on the
    same key partitioning. The frontier table never exceeds one row per
    key, so k stages cost k co-partitioned joins over shrinking inputs
    (classic funnel queries need the FULL event set sorted per key;
    this never sorts and never materializes a per-key array).
    """
    if not steps:
        raise ValueError("funnel: need at least one step predicate")
    cur = (
        df.filter(_as_col(steps[0]))
        .groupBy(by)
        .agg(F.min(order_col).alias("step_1"))
    )
    for i, p in enumerate(steps[1:], start=2):
        cand = df.filter(_as_col(p)).select(by, order_col)
        nxt = (
            cand.join(cur.select(by, f"step_{i - 1}"), by)
            .filter(F.col(order_col) > F.col(f"step_{i - 1}"))
            .groupBy(by)
            .agg(F.min(order_col).alias(f"step_{i}"))
        )
        cur = cur.join(nxt, by, "left")
    reached = F.lit(0)
    for i in range(1, len(steps) + 1):
        reached = reached + F.when(
            F.col(f"step_{i}").isNotNull(), F.lit(1)
        ).otherwise(F.lit(0))
    return cur.select(
        by,
        *[f"step_{i}" for i in range(1, len(steps) + 1)],
        reached.cast("int").alias("reached"),
    )


def match_runs(
    df: DataFrame,
    pred: Column | str,
    min_len: int = 2,
    by: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Maximal runs of >= ``min_len`` CONSECUTIVE rows satisfying
    ``pred`` (per key, in stream order) — the Kleene-plus complement of
    ``match_steps`` and the classic ops alert ("3+ consecutive errors
    in one conversation").

    Gaps-and-islands with two row_numbers over the SAME key partition:
    rows where pred holds get island id rn_all − rn_pred, one groupBy
    emits (key, run_start, run_end, run_len) per maximal island. Both
    windows and the groupBy share the one key exchange; per-task state
    is two counters, so a 10^7-turn conversation streams through
    without materializing anything per-run.
    """
    w = Window.partitionBy(by).orderBy(order_col)
    p = _as_col(pred)
    marked = df.select(
        by,
        F.col(order_col),
        p.alias("_p"),
        F.row_number().over(w).alias("_rn"),
    )
    hits = marked.filter(F.col("_p")).withColumn(
        "_island",
        F.col("_rn")
        - F.row_number().over(Window.partitionBy(by).orderBy("_rn")),
    )
    runs = hits.groupBy(by, "_island").agg(
        F.min(order_col).alias("run_start"),
        F.max(order_col).alias("run_end"),
        F.count("*").cast("bigint").alias("run_len"),
    )
    return runs.filter(F.col("run_len") >= min_len).select(
        by, "run_start", "run_end", "run_len"
    )
