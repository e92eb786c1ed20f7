"""Aggregate stage — metrics + per-partition lineage (A4 in SURVEY §2.7).

The reference logs per-message producer success (producers.go:882-884);
at batch scale that becomes materialized metrics tables:

- ``_metrics``: per-sink row counts for the run (correctness anchor);
- ``_lineage``: per input-partition provenance (run_id, stage,
  partition_id, rows) via ``spark_partition_id()`` — zero-shuffle
  (partial agg per partition is the whole agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metrics(routed: DataFrame, run_id: str) -> DataFrame:
    return (
        routed.groupBy("sink")
        .agg(F.count("*").alias("rows"))
        .select(F.lit(run_id).alias("run_id"), "sink", "rows")
    )


def lineage_from_col(
    df: DataFrame, run_id: str, stage: str, pid_col: str = "src_partition_id"
) -> DataFrame:
    """Lineage keyed by a MATERIALIZED partition-id column (stamped at
    scan time by the single-pass plan) instead of the runtime
    ``spark_partition_id()`` — so provenance survives the round trip
    through the written sink tables and maps each output row back to
    the input split that produced it."""
    return (
        df.groupBy(F.col(pid_col).alias("partition_id"))
        .agg(
            F.count("*").alias("rows"),
            F.min("conv_id").alias("min_conv_id"),
            F.max("conv_id").alias("max_conv_id"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "rows",
            "min_conv_id",
            "max_conv_id",
        )
    )


def lineage(df: DataFrame, run_id: str, stage: str) -> DataFrame:
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("rows"),
            F.min("conv_id").alias("min_conv_id"),
            F.max("conv_id").alias("max_conv_id"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "rows",
            "min_conv_id",
            "max_conv_id",
        )
    )


def rollup_time_windows(
    df: DataFrame,
    width: str = "1 hour",
    slide: str | None = None,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    user_col: str = "user_id",
) -> DataFrame:
    """Tumbling / hopping event-time rollup over the raw event log —
    the batch form of a hypertable continuous aggregate. The
    ``F.window`` groupBy shape is the one Structured Streaming runs
    under a watermark, with ONE exception: ``n_users`` uses an exact
    ``count_distinct``, which streaming rejects — a readStream port
    must swap it for ``approx_count_distinct`` (or pre-dedup
    (window, user) in a first stage); count/sum port as-is.

    Returns one row per (window, keys) with the event count, exact
    distinct-user count, and the value sum quantized row-locally to
    integer micro-units (round(value*1e6) BEFORE the sum) so the
    cross-row double sum is order-independent.

    Scale shape: ONE map-side-combined groupBy on (window, keys). A
    hopping window (slide < width) replicates each row into
    width/slide windows *before* the partial agg, so the shuffle still
    carries only aggregated buckets — never the replicated event rows.
    At 100 TB the output cardinality is bounded by
    (time range / slide) × |keys|, independent of input size.
    """
    win = F.window(F.col(ts_col).cast("timestamp"), width, slide or width)
    out = (
        df.groupBy(win.alias("_w"), *[F.col(c) for c in keys])
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct(F.col(user_col)).alias("n_users"),
            F.sum(
                F.round(F.col(value_col) * 1e6).cast("bigint")
            ).alias("value_sum_micro"),
        )
    )
    return out.select(
        F.unix_micros(F.col("_w.start")).alias("window_start_us"),
        F.unix_micros(F.col("_w.end")).alias("window_end_us"),
        *keys,
        "n_events",
        "n_users",
        "value_sum_micro",
    )
