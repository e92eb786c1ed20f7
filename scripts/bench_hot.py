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


def run_mode(spark, tr, tm, rm, hot_block_size):
    cfg = pipeline.PipelineConfig(hot_block_size=hot_block_size)
    t0 = time.time()
    routed = pipeline.build_single_pass(tr, tm, rm, cfg)
    n = routed.count()
    return time.time() - t0, n


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    spark = get_spark()
    tr = hot_conv(spark, n).localCheckpoint()  # pin input out of both timings
    tm, rm = datagen.tool_meta(spark), datagen.role_meta(spark)
    for label, hbs in [("window", None), (f"hot(block={block})", block)]:
        # two timed runs per mode, min reported (JIT/warmup noise)
        times = []
        for _ in range(2):
            dt, rows = run_mode(spark, tr, tm, rm, hbs)
            times.append(dt)
        print(
            f"{label:>20}: {min(times):7.2f} s  ({rows} rows, "
            f"{rows / min(times):,.0f} turns/s)"
        )


if __name__ == "__main__":
    main()
