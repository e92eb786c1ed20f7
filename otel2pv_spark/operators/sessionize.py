"""Gap-based sessionization — the batch form of the reference's
per-tree "collect until quiet" semantics applied to a flat event log
(GroupAndVerify's verification timeout, groupandverify.go:873-919,
closes a tree after 2 s of silence; a session closes after ``gap`` of
silence in the same key's stream).

Scale shape: ONE shuffle on the key; the session number is a running
sum over the same (key, ts) sort the lag uses, so Catalyst plans one
exchange + one sort for both windows. ``session_stats`` groups by
(key, session_id) — a superset of the window's hash partitioning, so
the aggregation reuses the exchange (no second shuffle; same subset
rule the pipeline relies on). Hot keys are bounded by one user's event
volume — the same skew class as hot conv_ids in the sequence stage
(salt or split upstream if a single key exceeds a task's memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(col):
    """Epoch microseconds; the cast handles TIMESTAMP_NTZ inputs (the
    parquet fixtures are NTZ, unix_micros only takes TIMESTAMP — with
    the session pinned to UTC the instant is unchanged)."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_sec: int = 1800,
) -> DataFrame:
    """Assign ``session_n`` / ``session_id`` per key: a new session
    starts at the first event and whenever the gap since the previous
    event exceeds ``gap_sec`` (exclusive — a gap of exactly ``gap_sec``
    stays in-session). Deterministic under ts ties via the tiebreak."""
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    us = _us(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    starts = df.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_sec * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    out = starts.withColumn(
        "session_n", F.sum("_new_session").over(wrun).cast("bigint")
    ).drop("_new_session")
    return out.withColumn(
        "session_id",
        F.concat_ws("-", F.col(key_col).cast("string"), F.col("session_n").cast("string")),
    )


def session_stats(
    sessions: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-session rollup over :func:`sessionize` output."""
    start = F.min(ts_col)
    end = F.max(ts_col)
    return sessions.groupBy(key_col, "session_id").agg(
        F.count("*").alias("n_events"),
        start.alias("session_start"),
        end.alias("session_end"),
        # floor, not cast: cast(double→bigint) truncates in Spark but
        # ROUNDS in DuckDB — floor() agrees everywhere
        F.floor((_us(end) - _us(start)) / F.lit(1_000_000))
        .cast("bigint")
        .alias("duration_sec"),
        F.count_distinct(type_col).alias("n_event_types"),
    )
