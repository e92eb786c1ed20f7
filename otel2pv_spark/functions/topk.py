"""Skew-safe two-level top-k — the shared pattern behind every
bounded ranking op (brute-force ANN, BM25, frequent n-grams).

A plain per-group window ships EVERY scored row of a group into ONE
task — at scale the group can be the whole corpus. Instead:
(1) the caller projects down to the narrow ranking triple first (wide
    payload columns never shuffle);
(2) top-k within (group, input-partition): partition-bounded, never
    group-bounded;
(3) a tiny final window merges the <= k x P survivors per group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_level_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows per ``group_cols`` group under ``order_cols``.

    ``group_cols`` may be empty for a global top-k (the final window
    then runs over <= k x P rows — the only single-partition step, on
    config-sized data). ``order_cols`` must be a total order within a
    group (include an id tiebreak) or ranks are nondeterministic.
    Appends ``rank_col``; preserves every input column.
    """
    scored = df.select("*", F.spark_partition_id().alias("_pid"))
    w_part = Window.partitionBy(*group_cols, "_pid").orderBy(*order_cols)
    partial = (
        scored.withColumn("_pr", F.row_number().over(w_part))
        .filter(F.col("_pr") <= k)
        .drop("_pr", "_pid")
    )
    final_keys = list(group_cols) if group_cols else [F.lit(0)]
    w = Window.partitionBy(*final_keys).orderBy(*order_cols)
    return partial.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
