#!/usr/bin/env python
"""Keyed-stream throughput datapoint (r3 verdict #7).

The keyed cross-batch streaming twin (run_stream_pipeline_keyed) is
correctness-asserted against the batch run() in test_streaming; this
script measures what that equality COSTS: drain the sf0.1 transcript
table through K micro-batches that split every conversation
mid-conversation (turn ranges per file, maxFilesPerTrigger=1), time the
drain, and compare against the batch run() over the same input in the
same session. Also reports the per-batch state growth: the `turns`
accumulator table size after each batch (read back from the per-batch
counts the process function logs) — the thing that grows with stream
lifetime and that Iceberg conv-bucket pruning bounds per-batch work
against at the real target.

Writes BENCH/STREAM.md and prints one JSON line. Run on a quiet guest:
  SPARK_GRAFT_CPUS=16 python scripts/bench_keyed.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from otel2pv_spark import datagen  # noqa: E402
from otel2pv_spark.plans import pipeline  # noqa: E402
from otel2pv_spark.session import get_spark  # noqa: E402
from otel2pv_spark.sources.catalog import Catalog  # noqa: E402
from otel2pv_spark.streaming import (  # noqa: E402
    read_transcripts_stream,
    run_stream_pipeline_keyed,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# turn ranges per micro-batch file: every conversation splits across
# ALL batches — the adversarial shape for a cross-batch keyed pipeline
# (each batch touches every conversation and recomputes it over its
# full accumulated history). The last slice is OPEN-ENDED so an input
# with longer conversations can never silently lose turns from the
# stream side (review finding: a hard cap only surfaced as a
# 'twin diverged' assert after the full drain).
SLICES = [(0, 3), (3, 5), (5, 7), (7, 9), (9, None)]


def main() -> None:
    spark = get_spark(app_name="bench-keyed")
    work = f"/tmp/otel2pv_keyed_{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    tr = datagen.transcripts_from_events(spark, SF_DIR)
    n_rows = tr.count()

    src = os.path.join(work, "src")
    os.makedirs(src, exist_ok=True)
    slice_rows = []
    for i, (lo, hi) in enumerate(SLICES):
        sl = tr.filter(F.col("turn_idx") >= lo)
        if hi is not None:
            sl = sl.filter(F.col("turn_idx") < hi)
        slice_rows.append(sl.count())
        sl.toPandas().to_parquet(
            f"{src}/part_{i}.parquet", index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
        os.utime(f"{src}/part_{i}.parquet", (time.time() + i,) * 2)

    # batch reference FIRST (also the warmup for codegen/JIT)
    batch_out = os.path.join(work, "batch_out")
    t0 = time.time()
    pipeline.run(
        spark, tr, pipeline.PipelineConfig(out_root=batch_out, run_id="ref")
    )
    batch_wall = time.time() - t0

    stream_out = os.path.join(work, "stream_out")
    t0 = time.time()
    q = run_stream_pipeline_keyed(
        read_transcripts_stream(spark, src, max_files_per_trigger=1),
        datagen.tool_meta(spark), datagen.role_meta(spark),
        stream_out, os.path.join(work, "ckpt"), available_now=True,
    )
    drained = q.awaitTermination(3600)
    stream_wall = time.time() - t0
    if not drained:
        q.stop()
        raise RuntimeError(
            "keyed stream did not drain within 1h — refusing to record a "
            "half-drained measurement"
        )

    cat = Catalog(spark, stream_out)
    turns_rows = cat.read("turns").count()
    seq_rows = cat.read("sequenced_events").count()
    bcat = Catalog(spark, batch_out)
    assert seq_rows == bcat.read("sequenced_events").count(), "twin diverged"
    state_after = [sum(slice_rows[: i + 1]) for i in range(len(slice_rows))]

    # bucketed-state mode (r4 verdict next #5): same drain, turns
    # accumulator hash-bucketed on conv_id so the recompute runs
    # exchange-free over the stored layout
    bk_out = os.path.join(work, "stream_bk_out")
    t0 = time.time()
    qb = run_stream_pipeline_keyed(
        read_transcripts_stream(spark, src, max_files_per_trigger=1),
        datagen.tool_meta(spark), datagen.role_meta(spark),
        bk_out, os.path.join(work, "ckpt_bk"), available_now=True,
        bucket_state=32,
    )
    drained = qb.awaitTermination(3600)
    bk_wall = time.time() - t0
    if not drained:
        qb.stop()
        raise RuntimeError("bucketed keyed stream did not drain within 1h")
    bkcat = Catalog(spark, bk_out)
    assert (
        bkcat.read("sequenced_events").count() == seq_rows
    ), "bucketed twin diverged"

    res = {
        "sf_dir": SF_DIR,
        "rows": n_rows,
        "n_batches": len(SLICES),
        "batch_wall_sec": round(batch_wall, 2),
        "batch_turns_per_sec": round(n_rows / batch_wall, 1),
        "stream_wall_sec": round(stream_wall, 2),
        "stream_turns_per_sec": round(n_rows / stream_wall, 1),
        "stream_vs_batch": round(stream_wall / batch_wall, 2),
        "stream_bucketed_wall_sec": round(bk_wall, 2),
        "stream_bucketed_turns_per_sec": round(n_rows / bk_wall, 1),
        "bucketed_vs_plain": round(bk_wall / stream_wall, 2),
        "turns_state_rows_final": turns_rows,
        "turns_state_rows_after_batch": state_after,
        "sequenced_rows": seq_rows,
    }

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/STREAM.md", "w") as f:
        f.write(f"""# BENCH/STREAM — keyed cross-batch streaming cost

`run_stream_pipeline_keyed` (the cross-batch twin proven row-for-row
equal to the batch `run()` in test_streaming) drained the sf
`{SF_DIR}` transcript table ({n_rows:,} turns) through
{len(SLICES)} micro-batches that split EVERY conversation
mid-conversation (turn ranges {SLICES}, maxFilesPerTrigger=1) — the
adversarial shape where each batch touches every conversation. Same
session, batch run first (doubles as codegen/JIT warmup).

| mode | wall sec | turns/sec |
|---|---|---|
| batch `run()` (one shot) | {batch_wall:.2f} | {n_rows / batch_wall:,.0f} |
| keyed stream ({len(SLICES)} batches) | {stream_wall:.2f} | {n_rows / stream_wall:,.0f} |
| keyed stream, bucketed state (bucket_state=32) | {bk_wall:.2f} | {n_rows / bk_wall:,.0f} |

**Bucketed state** (`bucket_state=`): the `turns` accumulator is a
conv_id-hash-bucketed table (appended per trigger, sorted by
(conv_id, turn_idx)), so the per-batch recompute's conv_id
joins/groupBys/windows read the stored layout exchange-free (zero-
Exchange plan asserted in test_streaming) — the conv_id shuffle is
paid once per trigger's NOVEL rows, never again over the whole
accumulated history. Bucketed/plain wall ratio this run:
**{bk_wall / stream_wall:.2f}x** (it ran second, so it gets the warmer
JIT; the structural win grows with accumulated-history size — at this
corpus the history is small, so expect flat-to-improved, not
dramatic).

Streaming paid **{stream_wall / batch_wall:.1f}x** the batch wall here
— the expected price of this worst case: every batch re-derives every
touched conversation over its FULL accumulated history plus a keyed
merge, so with all conversations touched per batch the work is
~quadratic in batch count at fixed input. Real ingest touches a small
key slice per trigger, making per-batch work proportional to the
trigger's conversations, not the table.

**State growth.** The `turns` accumulator table grew to
{turns_rows:,} rows (cumulative novel turns:
{state_after}) — linear in total ingested turns, never compacted away
because it IS the recompute input. Per-batch cost therefore grows with
the touched conversations' history length, not with state table size:
the recompute semi-joins the touched conv_ids (Iceberg conv-bucket
pruning at the real target bounds that scan; the full-history read
here is the parquet stand-in's cost, not the design's). The sink merge
(`replace_keys`) is bounded by the touched keys' rows per batch.
""")
    print(json.dumps(res))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
