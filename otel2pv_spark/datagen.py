"""Deterministic transcript-table construction.

Two producers of the same schema
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` (BASELINE.json input_hint):

1. :func:`transcripts_from_events` — derives transcripts from the
   driver's ``events`` parquet via the dialect-portable SQL in
   ``portable_sql.py``. This is what the oracle-checked queries use:
   DuckDB runs the *same* CTE, so both engines see identical input.

2. :func:`synth_transcripts` — a pure-Spark seedless generator
   (hash-arithmetic on ``spark.range``; no rand(), so deterministic
   under any partitioning) used for bench-scale data (millions of
   turns) and the Zipf-skew / hot-conversation fixtures. Runs fully in
   whole-stage codegen — generation itself is distributed and would
   scale to 10^12 rows on a cluster (spark.range parallelizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .portable_sql import (
    MAINT_CTE,
    ROLE_META_ROWS,
    TOOL_META_ROWS,
    TOOL_VERSIONS_CTE,
    with_transcripts,
)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events parquet → transcripts via the shared portable SQL."""
    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(with_transcripts("SELECT * FROM transcripts"))


def tool_meta(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        TOOL_META_ROWS, "tool string, tool_category string, owner string, tool_sink string"
    )


def role_meta(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        ROLE_META_ROWS, "role string, role_kind string, default_sink string"
    )


def tool_versions(spark: SparkSession) -> DataFrame:
    """Versioned tool-config dim (SCD-2) for the as-of join — built via
    the shared portable CTE so Spark and DuckDB parse the exact same
    TIMESTAMP literals (createDataFrame with naive datetimes would go
    through the driver's local tz instead of the session tz)."""
    return spark.sql("WITH " + TOOL_VERSIONS_CTE + " SELECT * FROM tool_versions")


def maintenance_windows(spark: SparkSession) -> DataFrame:
    """Interval dim (window_id, tool, start_ts, end_ts, reason) for the
    overlap join — shared portable CTE so Spark and DuckDB parse the
    exact same TIMESTAMP literals (see tool_versions)."""
    return spark.sql("WITH " + MAINT_CTE + " SELECT * FROM maint")


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    avg_turns: int = 12,
    hot_convs: int = 1,
    hot_turns: int = 0,
    malformed_mod: int = 97,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic transcripts at arbitrary scale.

    Conversation sizes vary pseudo-randomly 3..2*avg_turns-3 via
    xxhash64(conv, seed); the first ``hot_convs`` conversations get
    ``hot_turns`` turns (default 100× avg) — the skew fixture
    (FIXTURES.md §1). All arithmetic is per-row hash math: no RNG
    state, so any executor computes any row identically.
    """
    hot_turns = hot_turns or avg_turns * 100
    max_turns = max(2 * avg_turns, hot_turns)

    convs = spark.range(0, n_convs, 1, partitions or spark.sparkContext.defaultParallelism)
    convs = convs.select(
        F.col("id").alias("conv_n"),
        F.when(F.col("id") < hot_convs, F.lit(hot_turns))
        .otherwise(
            (F.abs(F.xxhash64(F.col("id"), F.lit(seed))) % (2 * avg_turns - 6) + 3)
        )
        .alias("n_turns"),
    )
    turns = convs.select(
        "conv_n",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    h = F.abs(F.xxhash64("conv_n", "turn_idx", F.lit(seed)))
    conv_id = F.concat(F.lit("conv-"), F.lpad(F.col("conv_n").cast("string"), 8, "0"))
    role = (
        F.when(F.col("turn_idx") % 3 == 0, "user")
        .when(F.col("turn_idx") % 3 == 1, "assistant")
        .otherwise("tool")
    )
    tool = F.when(
        F.col("turn_idx") % 3 == 2, F.concat(F.lit("tool-"), (h % 8).cast("string"))
    ).otherwise(F.lit(""))
    event_type = F.element_at(
        F.array(F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("error")),
        (h % 4 + 1).cast("int"),
    )
    eid = F.concat(conv_id, F.lit(":"), F.col("turn_idx").cast("string"))
    parent = F.when(F.col("turn_idx") == 0, F.lit("-")).otherwise(
        F.concat(conv_id, F.lit(":"), (F.col("turn_idx") - 1).cast("string"))
    )
    body = F.concat(F.lit('{"k": '), (h % 100).cast("string"), F.lit("}"))
    good = F.concat(
        F.lit("event="), event_type,
        F.lit(" id="), eid,
        F.lit(" parent="), parent,
        F.lit(" job=job-"), (F.col("conv_n") % 5).cast("string"),
        F.lit(" app=app-"), (h % 3).cast("string"),
        F.lit(" :: "), body,
    )
    text = F.when(h % malformed_mod == 0, F.concat(F.lit("garbled "), body)).otherwise(good)
    ts = F.timestamp_seconds(
        F.lit(1700000000) + F.col("conv_n") * 86400 + F.col("turn_idx") * 30 + (h % 29)
    )
    return turns.select(
        conv_id.alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
