"""Pin the hot-conversation guidance with numbers: one conversation of
N turns (default 10^6) through the default window path vs the
block-salted hot mode (``hot_block_size``), same plan otherwise.

The README/pipeline docstring claim this defends: the window path wins
until individual conversations reach ~10^7 turns, so hot mode is
insurance for pathological tails, not the default. Results are
recorded in BENCH/BASELINE.md (hot-conversation section).

Usage: python scripts/bench_hot.py [n_turns] [hot_block_size]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from otel2pv_spark import datagen  # noqa: E402
from otel2pv_spark.plans import pipeline  # noqa: E402
from otel2pv_spark.session import get_spark  # noqa: E402


def hot_conv(spark, n: int):
    """One conversation, n turns, in the exact transcript text format
    (every 97th turn garbled, like the real derivation)."""
    base = spark.range(n).select(
        F.lit("conv-hot").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("role"),
        F.col("id").alias("_i"),
    )
    text = F.concat(
        F.lit("event=view id=conv-hot:"),
        F.col("turn_idx").cast("string"),
        F.lit(" parent="),
        F.when(F.col("turn_idx") == 0, F.lit("-")).otherwise(
            F.concat(F.lit("conv-hot:"), (F.col("turn_idx") - 1).cast("string"))
        ),
        F.lit(" job=job-1 app=app-1 :: "),
        F.concat(F.lit('{"k": '), (F.col("_i") % 100).cast("string"), F.lit("}")),
    )
    return base.select(
        "conv_id",
        "turn_idx",
        "role",
        F.when(F.col("_i") % 97 == 0, F.concat(F.lit("garbled "), text))
        .otherwise(text)
        .alias("text"),
        F.when(F.col("role") == "tool", F.lit("tool-1"))
        .otherwise(F.lit(""))
        .alias("tool"),
        F.timestamp_micros(
            F.lit(1704067200000000) + F.col("_i") * 1000000
        ).alias("ts"),
    )


def mixed_corpus(spark, n_normal_rows: int, hot_turns: int):
    """A normal corpus (12-turn conversations) plus ONE hot
    conversation of ``hot_turns`` — the realistic skew shape the
    guidance is about: in window mode the hot conversation is the
    straggler task; in hot mode every row pays the block-salt
    machinery."""
    normal = (
        spark.range(n_normal_rows)
        .select(
            F.concat(
                F.lit("conv-"), (F.col("id") / 12).cast("bigint").cast("string")
            ).alias("conv_id"),
            (F.col("id") % 12).cast("int").alias("turn_idx"),
            F.col("id").alias("_i"),
        )
    )
    normal = _with_text(normal)
    return normal.unionByName(hot_conv(spark, hot_turns))


def _with_text(base):
    text = F.concat(
        F.lit("event=view id="),
        F.col("conv_id"),
        F.lit(":"),
        F.col("turn_idx").cast("string"),
        F.lit(" parent="),
        F.when(F.col("turn_idx") == 0, F.lit("-")).otherwise(
            F.concat(
                F.col("conv_id"), F.lit(":"), (F.col("turn_idx") - 1).cast("string")
            )
        ),
        F.lit(" job=job-1 app=app-1 :: "),
        F.concat(F.lit('{"k": '), (F.col("_i") % 100).cast("string"), F.lit("}")),
    )
    return base.select(
        "conv_id",
        "turn_idx",
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.col("_i") % 3 + 1).cast("int"),
        ).alias("role"),
        F.when(F.col("_i") % 97 == 0, F.concat(F.lit("garbled "), text))
        .otherwise(text)
        .alias("text"),
        F.when(F.col("_i") % 3 == 2, F.lit("tool-1")).otherwise(F.lit("")).alias(
            "tool"
        ),
        F.timestamp_micros(
            F.lit(1704067200000000) + F.col("_i") * 1000000
        ).alias("ts"),
    )


def run_mode(spark, tr, tm, rm, hot_block_size):
    cfg = pipeline.PipelineConfig(hot_block_size=hot_block_size)
    t0 = time.time()
    routed = pipeline.build_single_pass(tr, tm, rm, cfg)
    # noop SINK, not count(): a bare count() lets Catalyst column-prune
    # the window expressions out of the pure-projection window plan
    # while the hot plan's join survives — a structurally biased
    # comparison (review finding). The noop write materializes every
    # output column in BOTH modes.
    routed.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    # row count OUTSIDE the timed region: count() re-executes with
    # column pruning, which the window plan benefits from but the hot
    # plan's join does not — the exact bias the noop sink removes.
    n = routed.count()
    return dt, n


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    mixed_normal = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    spark = get_spark()
    if mixed_normal:
        tr = mixed_corpus(spark, mixed_normal, n).localCheckpoint()
        shape = f"mixed({mixed_normal} normal + {n}-turn hot conv)"
    else:
        tr = hot_conv(spark, n).localCheckpoint()
        shape = f"single {n}-turn conv"
    tm, rm = datagen.tool_meta(spark), datagen.role_meta(spark)
    print(shape)
    modes = [("window", None), (f"hot(block={block})", block)]
    # one warmup run per mode first (JIT/codegen), then ALTERNATE the
    # timed runs so neither mode systematically pays cold-JVM cost;
    # min of 2 reported per mode
    for _label, hbs in modes:
        run_mode(spark, tr, tm, rm, hbs)
    times = {label: [] for label, _ in modes}
    rows = 0
    for _ in range(2):
        for label, hbs in modes:
            dt, rows = run_mode(spark, tr, tm, rm, hbs)
            times[label].append(dt)
    for label, _ in modes:
        t = min(times[label])
        print(
            f"{label:>20}: {t:7.2f} s  ({rows} rows, "
            f"{rows / t:,.0f} turns/s)"
        )


if __name__ == "__main__":
    main()
