"""Streaming pipeline — the live-queue analog of the batch DAG.

Two modes, mirroring the reference's architecture (file:line into
/root/reference):

1. **Micro-batch incremental pipeline** (``run_stream_pipeline``):
   ``readStream`` over a growing transcript directory →
   ``foreachBatch`` applying the SAME batch operators (parse → enrich →
   verify → sequence → route) → per-sink append. This is the analog of
   the consumer → pipe → producer chain (Server/server.go:74-105) with
   the micro-batch replacing the AMQP delivery: source offsets +
   checkpointLocation give the ack-after-downstream-success semantics
   (Server/consumers.go:638-651) — a batch is only committed to the
   offset log after its foreachBatch writes return.
   Assumption (documented): a conversation's turns arrive within one
   micro-batch (file = bundle of whole conversations), the analog of
   the Sequencer receiving the whole tree as one message
   (sequencer.go:812-832). Cross-batch conversations need mode 2.

2. **Stateful group-and-verify** (``stateful_group_verify``):
   ``applyInPandasWithState`` keyed by conv_id — the actor-per-tree
   demultiplex (groupandverify.go:424-506) with Spark's state store
   replacing the per-tree goroutine + map. Turns accumulate in state;
   a conversation emits when its chain is complete (every turn's
   parent link matches the previous turn — the bidirectional-balance
   specialization, groupandverify.go:555-671) or when the
   processing-time timeout expires, in which case it emits unverified —
   exactly the 2 s verification-timeout semantics
   (groupandverify.go:873-919, default :211). Late turns for an
   already-emitted conversation start a NEW state instance, matching
   the mop-up re-enqueue (groupandverify.go:456-474).

Scale shape: state is hash-partitioned by conv_id across executors
(same as the batch shuffle); per-conv state is bounded by conversation
length; RocksDB state store + changelog checkpointing are the
production knobs (config, not code).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..snapshot import snapshot
from ..operators import enrich as enrich_op
from ..operators import parse as parse_op
from ..operators import route as route_op
from ..operators import sequence as seq_op
from ..operators import verify as verify_op
from ..plans.pipeline import KNOWN_SINKS, OUTPUT_COLS, REJECT_COLS

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_transcripts_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a transcript directory (S1/S2 analog:
    new files are the arriving messages; source offsets are the acks)."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def run_stream_pipeline(
    stream: DataFrame,
    tool_meta: DataFrame,
    role_meta: DataFrame,
    out_root: str,
    checkpoint: str,
    available_now: bool = False,
):
    """foreachBatch micro-batch pipeline: same operators as the batch
    DAG, once per micro-batch; sink fan-out + rejects per batch."""

    def process(batch: DataFrame, batch_id: int) -> None:
        parsed = parse_op.parse(batch).persist()
        try:
            good, parse_rejects = parse_op.split_rejects(parsed)
            enriched = enrich_op.enrich(good, tool_meta, role_meta)
            ver = verify_op.chain_verify(parsed).select("conv_id", "verified")
            enriched = enriched.join(ver, "conv_id", "left")
            seq = seq_op.sequence_window(
                enriched, dup_compare_cols=("role", "text", "tool")
            )
            routable, route_rejects = route_op.route(seq, KNOWN_SINKS)
            routable.select(*OUTPUT_COLS).write.mode("append").partitionBy(
                "sink"
            ).parquet(f"{out_root}/sequenced_events")
            parse_rejects.select(*REJECT_COLS).unionByName(
                route_rejects.select(*REJECT_COLS)
            ).write.mode("append").parquet(f"{out_root}/rejects")
        finally:
            parsed.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_pipeline_keyed(
    stream: DataFrame,
    tool_meta: DataFrame,
    role_meta: DataFrame,
    out_root: str,
    checkpoint: str,
    available_now: bool = False,
    bucket_state: int | None = None,
):
    """The cross-batch micro-batch pipeline: row-for-row equal to the
    batch ``run()`` at EVERY batch boundary, even when a conversation's
    turns split across micro-batches (mode 1's whole-conversation
    assumption removed). Each batch: (1) accumulate novel turns into a
    Catalog ``turns`` table keyed on (conv_id, turn_idx) — an anti-join
    makes redelivery/replay idempotent, first version of a key wins;
    (2) recompute ONLY the touched conversations over their FULL turn
    history; (3) ``replace_keys``-merge into the sink tables (Iceberg
    MERGE at the real target). This is the reference's late-message
    mop-up (a late same-tree message re-processes that tree,
    groupandverify.go:456-474) as a keyed merge, and the standard
    Spark shape for exactly-once-by-key sinks over at-least-once
    micro-batches.

    Crash safety: turns append is an atomic Catalog commit; the
    per-batch recompute runs under a ``run_incremental`` manifest
    (``incr-sb<start-uid>-<batch_id>`` — the start uid keeps manifests
    from a reset checkpoint or a second stream from aliasing), so a
    replayed batch re-derives the same state instead of
    double-merging. Scale shape: the recompute scans
    only the touched conversations (semi-join; Iceberg conv-bucket
    pruning at the real target — the full-history read here is the
    parquet stand-in's cost, not the design's).

    ``bucket_state`` (r4 verdict next #5): maintain the ``turns``
    accumulator as a conv_id-HASH-BUCKETED table (`Catalog.
    write_bucketed`/`append_bucketed`, sorted by (conv_id, turn_idx))
    instead of plain Catalog parquet. The recompute's
    groupBys/windows on conv_id then run with ZERO Exchange off the
    stored layout (asserted in test_streaming) — the conv_id shuffle
    is paid once per trigger's novel rows at append time, never again
    over the whole accumulated history each batch. This is the
    Iceberg bucket(N, conv_id) write-distribution shape. Trade-off
    (documented on append_bucketed): the bucketed append uses the
    Spark file committer, not the Catalog atomic swap — an
    interrupted append can surface a prefix of the batch, which the
    per-key anti-join makes idempotent on replay (first version of a
    key still wins exactly once)."""
    import uuid as _uuid

    from ..plans import pipeline as pl
    from ..sources.catalog import Catalog

    # per-START identity mixed into each batch's run-manifest id:
    # batch_id alone is NOT a global identity — a reset/relocated
    # checkpoint (or a second stream into the same out_root) restarts
    # ids at 0 with different contents, and a bare sb<id> manifest
    # would make run_incremental skip the merge entirely (silent sink
    # divergence). With the start uid, a query RESTART from the same
    # checkpoint re-runs its replayed batch under a fresh manifest —
    # replace_keys is idempotent, so that reconverges; only the
    # redundant work is repeated, never correctness.
    start_uid = _uuid.uuid4().hex[:8]

    def process(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch.sparkSession
        # in-batch duplicates (producer retries landing in ONE trigger)
        # must collapse too, or the turns table holds two copies of a
        # key forever and every recompute diverges from the batch twin;
        # (ts, text) tiebreak keeps the dedup deterministic
        batch = (
            batch.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("conv_id", "turn_idx").orderBy(
                        F.col("ts"), F.col("text")
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .transform(snapshot)
        )
        if batch.isEmpty():
            return
        cat = Catalog(spark, out_root)
        if bucket_state:
            sort_cols = ("conv_id", "turn_idx")
            if cat.bucketed_exists("turns"):
                # re-attach (no-op when already registered here; fixes
                # a stale same-name registration from another root)
                cat.register_bucketed(
                    "turns", "conv_id", bucket_state, sort_by=sort_cols
                )
                novel = batch.join(
                    cat.read_bucketed("turns").select("conv_id", "turn_idx"),
                    ["conv_id", "turn_idx"],
                    "left_anti",
                )
                cat.append_bucketed(
                    novel, "turns", "conv_id", bucket_state, sort_by=sort_cols
                )
            else:
                cat.write_bucketed(
                    batch, "turns", "conv_id", bucket_state, sort_by=sort_cols
                )
            turns = cat.read_bucketed("turns")
        elif cat.exists("turns"):
            novel = batch.join(
                cat.read("turns").select("conv_id", "turn_idx"),
                ["conv_id", "turn_idx"],
                "left_anti",
            )
            cat.append(novel, "turns")
            turns = cat.read("turns")
        else:
            cat.write(batch, "turns")
            turns = cat.read("turns")
        keys = batch.select("conv_id").distinct()
        pl.run_incremental(
            spark,
            turns,
            pl.PipelineConfig(
                out_root=out_root, run_id=f"sb{start_uid}-{batch_id}"
            ),
            keys,
            tool_meta=tool_meta,
            role_meta=role_meta,
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_metrics(
    stream: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Event-time metrics over the live turn stream: per (window, role)
    turn counts + distinct-ish conversation bounds, with a watermark so
    state is bounded and late data has defined semantics — rows later
    than ``watermark_delay`` behind the max seen ``ts`` are dropped
    (the streaming analog of the batch `_metrics` table; the reference
    logs per-message success counts, producers.go:882-884).

    Append output mode: a window emits ONCE, when the watermark passes
    its end — late-but-within-delay rows still count (they arrive
    before finalization), later ones don't. State per (window, role) is
    a handful of aggregates; the watermark is what makes that state
    droppable at 100 TB/day ingest instead of growing forever.

    Timing note (measured on 4.1): stateful operators apply the
    watermark COMMITTED at query start, so within one availableNow run
    late rows a batch behind the data max still land; across restarts
    (or in a long-running query, across triggers) the bound is
    enforced — see test_stream_windowed_metrics_watermark_drops_late_rows."""
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.min("conv_id").alias("min_conv_id"),
            F.max("conv_id").alias("max_conv_id"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "n_turns",
            "min_conv_id",
            "max_conv_id",
        )
    )


def stream_session_stats(
    stream: DataFrame,
    key_col: str = "conv_id",
    gap: str = "30 minutes",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Sessionization over the live stream via Spark's native
    session_window — the streaming form of operators/sessionize (same
    gap rule: an event exactly ``gap`` after the previous one merges).
    Dynamic-gap session state is exactly what hand-rolled streaming
    sessionizers get wrong; here the engine owns merge + eviction: a
    session's state is dropped (and its one append-mode row emitted)
    when the watermark passes session end. Same bounded-state argument
    as stream_windowed_metrics, but per (key, session) instead of per
    fixed window."""
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(F.col(key_col), F.session_window("ts", gap).alias("sess"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            key_col,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_turns",
        )
    )


DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_docs_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def _append_alerts(df: DataFrame, path: str) -> None:
    """Append alert rows, keeping the table READABLE when empty: an
    append of an empty DataFrame emits only _SUCCESS (no part file),
    so a healthy stream would leave a directory schema inference
    cannot read. Seed the schema with an unpartitioned limit(0)
    overwrite instead (the same empty-write trap Catalog.write
    guards, sources/catalog.py) and skip the no-op append. The input
    is snapshot()-ed first: the emptiness probe would otherwise
    execute the full (uncached) alert pipeline once, and the append a
    second time — doubling the hot per-batch path."""
    import os as _os

    df = df.transform(snapshot)
    if df.isEmpty():
        if not _os.path.isdir(path):
            df.limit(0).write.mode("overwrite").parquet(path)
        return
    df.write.mode("append").parquet(path)


def _read_state(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a foreachBatch state table, returning None when it does not
    exist YET — a missing path, or a directory created but with no
    committed files (the crash window between mkdir and file commit
    surfaces as UNABLE_TO_INFER_SCHEMA). Any OTHER read failure
    (transient FS error, corrupt footer, permissions) raises and aborts
    the batch: a state silently read as empty would re-admit known
    duplicates / recompute baselines from nothing, so absence must be
    distinguished from unreadability (fail closed)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        msg = str(e)
        if (
            "PATH_NOT_FOUND" in msg
            or "Path does not exist" in msg
            or "UNABLE_TO_INFER_SCHEMA" in msg
        ):
            return None
        raise


def run_stream_dedup(
    doc_stream: DataFrame,
    index_path: str,
    out_root: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = False,
):
    """Continuous near-dup gate: each micro-batch of new documents is
    LSH-probed against the STORED band index
    (:func:`..functions.dedup.minhash_band_table`); novel docs append
    to ``{out_root}/clean`` and their bands append to the index, dups
    route to ``{out_root}/dup_rejects`` with the matched pair. The
    streaming form of ``minhash_lsh_candidates_incremental`` — the
    corpus is never rescanned; per-batch work is batch-size × bucket
    occupancy.

    Drop rule (matches the batch cluster canonical rule "keep the min
    member"): a new doc drops if it band-matches any indexed doc, or a
    smaller-id doc of the same batch. Source offsets + checkpoint give
    at-least-once appends; on the real target the two appends become
    one Iceberg transaction (catalog.py mapping) for exactly-once."""
    from ..functions import dedup as dd

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.transform(snapshot)  # stabilize: read twice below
        # absence vs unreadability: see _read_state (fail closed)
        idx = _read_state(spark, index_path)
        have_index = idx is not None

        # band the batch ONCE: the same table feeds candidate probing
        # AND the index append (the shingle+minhash pass is the
        # dominant per-batch cost — recomputing it doubled it)
        new_bands = dd.minhash_band_table(
            batch, id_col=id_col, text_col=text_col
        ).transform(snapshot)
        if not have_index:
            idx = new_bands.limit(0)  # empty index, same schema
        cand = dd.minhash_lsh_candidates_incremental(
            batch, idx, id_col=id_col, text_col=text_col, new_bands=new_bands
        )

        new_ids = batch.select(F.col(id_col).alias("_nid")).distinct()
        nb = new_ids.select(
            F.col("_nid").alias("doc_b"), F.lit(True).alias("_bn")
        )
        # doc_a < doc_b always: if doc_b is new it loses to the smaller
        # (or already-indexed) doc_a; else doc_a is the new side
        dup = (
            cand.join(nb, "doc_b", "left")
            .select(
                F.when(F.col("_bn").isNotNull(), F.col("doc_b"))
                .otherwise(F.col("doc_a"))
                .alias("_dup"),
                F.when(F.col("_bn").isNotNull(), F.col("doc_a"))
                .otherwise(F.col("doc_b"))
                .alias("matched_id"),
            )
        )
        first_match = dup.groupBy("_dup").agg(F.min("matched_id").alias("matched_id"))

        kept = batch.join(
            first_match.select(F.col("_dup").alias(id_col)), id_col, "left_anti"
        ).transform(snapshot)  # one materialization feeds both appends
        dropped = batch.join(
            first_match.withColumnRenamed("_dup", id_col), id_col
        )

        kept.write.mode("append").parquet(f"{out_root}/clean")
        # index append reuses the batch's bands (no re-hash): keep only
        # the surviving docs' rows
        new_bands.join(
            first_match.select(F.col("_dup").alias(id_col)), id_col, "left_anti"
        ).write.mode("append").parquet(index_path)
        dropped.select(id_col, "matched_id").write.mode("append").parquet(
            f"{out_root}/dup_rejects"
        )

    writer = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ------------------------------------------------------- stateful mode
STATE_SCHEMA = (
    "turn_idxs array<int>, event_ids array<string>, parents array<string>, "
    "n_expected int"
)
EMIT_SCHEMA = (
    "conv_id string, n_turns int, verified boolean, timed_out boolean, "
    "event_ids array<string>"
)


def _chain_complete(turns: list[int], parents: dict[int, str], ids: dict[int, str]) -> bool:
    """Straight-line bidirectional balance: contiguous turn_idx from 0
    and each turn's parent == previous turn's event id."""
    s = sorted(turns)
    if not s or s[0] != 0 or s != list(range(s[0], s[0] + len(s))):
        return False
    for k in s:
        want = "" if k == 0 else ids[k - 1]
        if parents.get(k, "") != want:
            return False
    return True


def _make_verify_group(timeout_ms: int):
    def _verify_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key

        if state.hasTimedOut:
            # G5: emit whatever was collected, flagged unverified
            turn_idxs, event_ids, parents, _ = state.get
            state.remove()
            # first-delivery canonical + distinct-turn count, matching
            # the verified branch's semantics for the same columns
            first: dict[int, str] = {}
            for k, eid in zip(turn_idxs, event_ids):
                if k not in first:
                    first[k] = eid
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [len(first)],
                    "verified": [False],
                    "timed_out": [True],
                    "event_ids": [[first[k] for k in sorted(first)]],
                }
            )
            return

        turn_idxs, event_ids, parents, n_expected = (
            state.get if state.exists else ([], [], [], None)
        )
        turn_idxs, event_ids, parents = list(turn_idxs), list(event_ids), list(parents)
        for pdf in pdfs:
            for t in pdf.itertuples(index=False):
                # a NULL turn_idx arrives as NaN through Arrow; int(nan)
                # would raise and crash-loop the micro-batch (the
                # checkpoint replays the same offsets forever) — skip
                # the unplaceable row instead, like n_expected below
                if t.turn_idx is None or pd.isna(t.turn_idx):
                    continue
                turn_idxs.append(int(t.turn_idx))
                event_ids.append(t.event_id or "")
                parents.append(t.parent_event_id or "")
                if t.n_expected is not None and not pd.isna(t.n_expected):
                    n_expected = int(t.n_expected)

        # FIRST delivery is canonical (groupandverify.go:839-861): build
        # the maps so earlier arrivals win — a corrupt re-delivery of an
        # already-seen turn must not overwrite the good copy
        ids: dict[int, str] = {}
        pmap: dict[int, str] = {}
        for k, eid, par in zip(turn_idxs, event_ids, parents):
            if k not in ids:
                ids[k] = eid
                pmap[k] = par
        complete = (
            n_expected is not None
            and len(set(turn_idxs)) >= n_expected
            and _chain_complete(list(set(turn_idxs)), pmap, ids)
        )
        if complete:
            # verified tree → emit once, drop state (early-exit, G6)
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [len(set(turn_idxs))],
                    "verified": [True],
                    "timed_out": [False],
                    "event_ids": [[ids[k] for k in sorted(ids)]],
                }
            )
        else:
            state.update((turn_idxs, event_ids, parents, n_expected))
            state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype="object"),
                    "n_turns": pd.Series([], dtype="int64"),
                    "verified": pd.Series([], dtype="bool"),
                    "timed_out": pd.Series([], dtype="bool"),
                    "event_ids": pd.Series([], dtype="object"),
                }
            )

    return _verify_group


def stateful_group_verify(parsed_stream: DataFrame, timeout_ms: int = 2000) -> DataFrame:
    """GroupAndVerify's actor-per-tree with timeout, as
    applyInPandasWithState keyed by conv_id.

    Input: parsed streaming rows with (conv_id, turn_idx, event_id,
    parent_event_id, n_expected) where n_expected is the conversation's
    expected turn count (the parentVerifySet expected-children analog,
    groupandverify.go:148-183 — in a transcript stream the 'end' turn
    carries the total). Emits one row per completed/timed-out
    conversation."""
    return parsed_stream.groupBy("conv_id").applyInPandasWithState(
        _make_verify_group(timeout_ms),
        outputStructType=EMIT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


EVENT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the raw event log."""
    reader = spark.readStream.schema(EVENT_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def stream_rollup(
    stream: DataFrame,
    width: str = "1 hour",
    slide: str | None = None,
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    user_col: str = "user_id",
) -> DataFrame:
    """The streaming port of ``aggregate.rollup_time_windows`` — the
    live half of the continuous aggregate (the batch op is the
    backfill; ``aggregate.rollup_merge`` is the append-batch refresh).

    Reuses the batch op's SHARED window/quantization helpers, so the
    three paths bucket and quantize identically, with the one
    documented semantic difference: streaming state cannot hold an
    exact distinct, so ``n_users_approx`` is ``approx_count_distinct``
    (HLL-sketch state, mergeable and watermark-droppable) — exact
    ``n_users`` stays the batch/merge paths' job. ``n_events`` and
    ``value_sum_micro`` match the batch output exactly.

    Append mode: a window emits once, when the watermark passes its
    end; state is bounded by (watermark horizon / slide) x |keys|.
    """
    from ..operators.aggregate import _value_micro, _win, _win_us

    # cast BEFORE the watermark, and hand _win the bare watermarked
    # column: casting after withWatermark detaches the watermark and
    # append-mode aggregation is rejected
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            _win(F.col(ts_col), width, slide).alias("_w"),
            *[F.col(c) for c in keys],
        )
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct(F.col(user_col)).alias("n_users_approx"),
            F.sum(_value_micro(value_col)).alias("value_sum_micro"),
        )
        .select(*_win_us(), *keys, "n_events", "n_users_approx", "value_sum_micro")
    )


def stream_hll_state(
    stream: DataFrame,
    width: str = "1 hour",
    slide: str | None = None,
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    user_col: str = "user_id",
    p: int = 8,
) -> DataFrame:
    """Streaming HLL register state per rollup grain — the live half of
    the SKETCHED continuous aggregate.

    ``stream_rollup``'s ``approx_count_distinct`` emits only an
    ESTIMATE, which cannot be combined with history; this emits the
    deterministic md5-derived register state itself
    (``functions/sketch.with_register_rho`` + per-register MAX), which
    is bit-identical to what the batch path
    (``operators/aggregate.rollup_users_hll``) produces for the same
    rows. Finalized-window state rows therefore fold EXACTLY into the
    stored state with ``sketch.hll_merge`` — and because the merge is
    an idempotent MAX, a replayed micro-batch cannot corrupt it (the
    lambda handoff the count/sum merge does not survive).

    Append mode: a (window, keys, register) row emits once when the
    watermark passes the window end; state is bounded by
    (watermark horizon / slide) x |keys| x 2^p rows.
    """
    from ..functions.sketch import with_register_rho
    from ..operators.aggregate import _win, _win_us

    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    tagged = with_register_rho(
        stream.withWatermark(ts_col, watermark_delay), user_col, p=p
    )
    return (
        tagged.groupBy(
            _win(F.col(ts_col), width, slide).alias("_w"),
            *[F.col(c) for c in keys],
            F.col("register"),
        )
        .agg(F.max("rho").alias("rho"))
        .select(*_win_us(), *keys, "register", "rho")
    )


def run_stream_anomaly(
    event_stream: DataFrame,
    state_path: str,
    alerts_path: str,
    checkpoint: str,
    width: str = "1 day",
    key: str = "event_type",
    trail: int = 4,
    nsigma: int = 3,
    watermark_delay: str = "2 hours",
    available_now: bool = False,
):
    """Live log-spike alerting: the streaming port of
    ``profile.anomaly_flags``, sharing the batch operator VERBATIM so
    the live and backfill paths can never disagree on what counts as
    an anomaly (the same lambda-coherence rule as stream_hll_state).

    stream_rollup finalizes (key, window) count rows in append mode at
    the watermark; each foreachBatch unions the finalized delta with
    the STORED rollup state, runs the exact-BIGINT trailing z-test
    over the union, and appends (a) alert rows for anomalous NEW
    windows and (b) the delta itself to the state. The trailing
    baseline of a new window is always complete: append-mode windows
    finalize in watermark order, so every earlier window of the same
    key is already in state or in the same delta.

    Per-batch cost is BOUNDED regardless of stream age: only the
    newest ``trail`` state rows per key can affect a new window's flag
    (anomaly_flags' baseline is the ``trail`` immediately preceding
    rows, and every state row is older than every delta row because
    append-mode windows finalize in watermark order), so the batch
    prunes the stored rollup to |keys| x trail rows before the union —
    the anomaly window never sees the full history, let alone events.
    At-least-once caveat: a replayed batch would re-append state rows
    (double-counting the baseline); on the real target the state
    append is an Iceberg MERGE on (key, window) for exactly-once —
    same mapping as the catalog commit paths.
    """
    from pyspark.sql import Window

    from ..operators.profile import anomaly_flags

    roll = stream_rollup(
        event_stream, width=width, watermark_delay=watermark_delay,
        keys=(key,),
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        delta = batch.select(
            key, "window_start_us", "n_events"
        ).transform(snapshot)
        if delta.isEmpty():
            return
        state = _read_state(spark, state_path)
        if state is None:
            state = delta.limit(0)
        # the newest `trail` windows per key are the only state rows a
        # NEW window's trailing baseline can use
        w_recent = Window.partitionBy(key).orderBy(
            F.col("window_start_us").desc()
        )
        recent = (
            state.withColumn("_rn", F.row_number().over(w_recent))
            .filter(F.col("_rn") <= trail)
            .drop("_rn")
        )
        hist = recent.unionByName(delta)
        flags = anomaly_flags(
            hist, "n_events", by=key, order_col="window_start_us",
            trail=trail, nsigma=nsigma,
        )
        alerts = flags.filter(F.col("anomaly")).join(
            delta.select(key, "window_start_us"),
            [key, "window_start_us"],
            "left_semi",
        )
        _append_alerts(alerts, alerts_path)
        delta.write.mode("append").parquet(state_path)

    writer = (
        roll.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_counter_rate(
    event_stream: DataFrame,
    state_root: str,
    out_root: str,
    checkpoint: str,
    width: str = "1 hour",
    series_cols: tuple[str, ...] = ("user_id", "event_type"),
    keys: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    available_now: bool = False,
):
    """Live counter rates: the streaming twin of
    ``aggregate.counter_rate``, sharing the batch operator VERBATIM
    (the lambda-coherence rule of run_stream_anomaly / stream_hll_state:
    live and backfill can never disagree on a delta because they run
    the same code).

    The only state a reset-aware rate needs is each series' LAST
    sample. Per micro-batch:

    1. read the stored per-series last-sample table (Catalog — atomic
       replace, so a crash leaves the previous state intact);
    2. rows at or before their series' stored sample are LATE under
       the PromQL scrape-order contract (a counter's samples arrive in
       order per series; a late sample would lag against the wrong
       neighbor) — routed to ``{out_root}/late``, never silently
       mis-lagged;
    3. union state rows with the fresh rows and run the batch
       ``counter_rate`` unchanged: a state row has no predecessor in
       the union so it emits NO delta of its own, but it IS the lag
       donor for the series' first fresh sample — the cross-batch
       delta falls out of the operator's own null-prev rule;
    4. append the per-window increments to ``{out_root}/increase``
       (sums are mergeable; ``read_counter_rates`` folds the log), and
       REPLACE the state with the new per-series last samples.

    State is one row per live series — the minimum any reset-aware
    rate can hold — and per-batch cost is batch-size + |series|,
    independent of stream age. At-least-once caveat: a replayed batch
    re-appends its increments; on the real target the increase append
    is an Iceberg MERGE at (keys, window) grain (the rollup_merge
    mapping) for exactly-once.
    """
    from ..operators.aggregate import counter_rate
    from ..sources.catalog import Catalog

    cols = [*series_cols, ts_col, tiebreak_col, value_col]

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.withColumn(
            ts_col, F.col(ts_col).cast("timestamp")
        ).transform(snapshot)
        if batch.isEmpty():
            return
        cat = Catalog(spark, state_root)
        state = (
            cat.read("series_last")
            if cat.exists("series_last")
            else batch.select(*cols).limit(0)
        )

        st = state.select(
            *[F.col(c).alias(f"_s_{c}") for c in series_cols],
            F.col(ts_col).alias("_s_ts"),
            F.col(tiebreak_col).alias("_s_tb"),
        )
        joined = batch.select(*cols).join(
            st, [F.col(c) == F.col(f"_s_{c}") for c in series_cols], "left"
        )
        is_late = F.col("_s_ts").isNotNull() & (
            (F.col(ts_col) < F.col("_s_ts"))
            | (
                (F.col(ts_col) == F.col("_s_ts"))
                & (F.col(tiebreak_col) <= F.col("_s_tb"))
            )
        )
        joined = joined.withColumn("_late", is_late).transform(snapshot)
        joined.filter("_late").select(*cols).write.mode("append").parquet(
            f"{out_root}/late"
        )
        fresh = joined.filter(~F.col("_late")).select(*cols)

        union = state.unionByName(fresh).transform(snapshot)
        counter_rate(
            union,
            series_cols=series_cols,
            ts_col=ts_col,
            value_col=value_col,
            tiebreak_col=tiebreak_col,
            width=width,
            keys=keys,
        ).write.mode("append").parquet(f"{out_root}/increase")

        new_state = (
            union.groupBy(*[F.col(c) for c in series_cols])
            .agg(F.max(F.struct(ts_col, tiebreak_col, value_col)).alias("_m"))
            .select(
                *series_cols,
                F.col(f"_m.{ts_col}").alias(ts_col),
                F.col(f"_m.{tiebreak_col}").alias(tiebreak_col),
                F.col(f"_m.{value_col}").alias(value_col),
            )
        )
        cat.write(new_state, "series_last")

    writer = (
        event_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_counter_rates(
    spark: SparkSession, out_root: str, keys: tuple[str, ...] = ("event_type",)
) -> DataFrame:
    """Fold the mergeable increase log to final per-window rates —
    identical output columns to the batch ``counter_rate``."""
    inc = spark.read.parquet(f"{out_root}/increase")
    return inc.groupBy(
        "window_start_us", "window_end_us", *[F.col(k) for k in keys]
    ).agg(
        F.sum("increase_micro").alias("increase_micro"),
        F.sum("n_deltas").alias("n_deltas"),
    )


def stream_correlate(
    request_stream: DataFrame,
    response_stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    horizon_sec: int = 7200,
    watermark_delay: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Live request/response correlation: the streaming port of
    ``enrich.request_response_join``, as a NATIVE watermarked
    stream-stream join — same output schema and pairing rule
    (``req_ts <= resp_ts < req_ts + horizon``), so live attribution and
    batch backfill agree (the module's standing lambda-coherence rule).

    Both sides are watermarked and the join carries an event-time range
    condition, which is exactly what Structured Streaming needs to
    BOUND the join state itself: a buffered request is dropped once the
    watermark passes ``req_ts + horizon``, a buffered response once it
    passes ``resp_ts`` — state per side ~ arrival rate x (watermark
    delay + horizon), independent of stream length. ``how="leftOuter"``
    emits a request with null response columns once its horizon expires
    below the watermark — live request-timeout alerts, the streaming
    twin of the batch op's leftOuter.

    Scale shape: the join is hash-partitioned on the equi-key across
    executors (same exchange as every keyed stage); RocksDB state store
    is the production knob for large horizons.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"stream_correlate: how={how!r}")
    req = (
        request_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark_delay)
        .select(
            F.col(key_col),
            F.col(id_col).alias("req_event_id"),
            F.col(ts_col).alias("_rr_req_ts"),
        )
    )
    resp = (
        response_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark_delay)
        .select(
            F.col(key_col).alias("_rr_key"),
            F.col(id_col).alias("resp_event_id"),
            F.col(ts_col).alias("_rr_resp_ts"),
        )
    )
    cond = (
        (F.col(key_col) == F.col("_rr_key"))
        & (F.col("_rr_resp_ts") >= F.col("_rr_req_ts"))
        & (
            F.col("_rr_resp_ts")
            < F.col("_rr_req_ts") + F.expr(f"INTERVAL {int(horizon_sec)} SECOND")
        )
    )
    return req.join(resp, cond, how).select(
        key_col,
        "req_event_id",
        F.unix_micros("_rr_req_ts").alias("req_ts_us"),
        "resp_event_id",
        F.unix_micros("_rr_resp_ts").alias("resp_ts_us"),
        (
            F.unix_micros("_rr_resp_ts") - F.unix_micros("_rr_req_ts")
        ).alias("latency_us"),
    )


def stream_exact_dedup(
    stream: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Native streaming exact dedup: keep the FIRST arrival per key,
    drop re-deliveries — the engine-state form of the reference's
    ack-after-downstream-success admission guard (at-least-once
    sources re-deliver; Server/consumers.go:638-651 acks late for
    exactly this reason). ``dropDuplicatesWithinWatermark`` holds
    per-key state only until the watermark passes the first arrival's
    event time + delay, so state is bounded by arrival rate x horizon
    — a plain streaming ``dropDuplicates`` never evicts and grows
    forever. The complement of the LSH gate: ``run_stream_dedup``
    drops NEAR-duplicates against a persistent index; this drops
    exact replays with zero external state, and belongs in front of
    any at-least-once ingest (a replay older than the horizon is
    admitted again — size the delay to the source's redelivery
    window)."""
    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def run_stream_burn_rate(
    event_stream: DataFrame,
    state_root: str,
    alerts_path: str,
    checkpoint: str,
    error_col: str = "is_error",
    budget_ppm: int = 1000,
    short_width: str = "1 hour",
    long_width: str = "1 day",
    short_factor: int = 14,
    long_factor: int = 3,
    key_col: str = "event_type",
    ts_col: str = "ts",
    watermark_delay: str = "2 hours",
    available_now: bool = False,
):
    """Live SLO burn-rate alerting: the streaming twin of
    ``aggregate.burn_rate_alerts``, sharing the alert CORE
    (``aggregate.burn_rate_from_short``) VERBATIM — what counts as a
    burn (the integer cross-multiplications, the window grains) can
    never drift between live and backfill because both run the same
    code. The alert SETS are not identical by construction: each
    micro-batch pages on long-window totals FINALIZED SO FAR (a 30%
    hour pages immediately even though the full day may dilute to 1% —
    the standard live-SLO semantics: a burn you can see is a burn you
    page on), while the batch operator is the after-the-fact truth
    over complete windows. They coincide when burn ratios are stable
    within the long window (the property the stream-equals-batch test
    pins on a ratio-stable fixture).

    The stream half aggregates (key, short-window) error/total counts
    in append mode (a window finalizes once, at the watermark); each
    foreachBatch then:

    1. prunes the stored short-rollup state to the LONG windows the
       delta touches — bounded by |touched long windows| x |keys| x
       (long/short) rows;
    2. unions pruned state + delta and runs the batch alert core
       unchanged;
    3. appends alerts for DELTA windows only (state rows already had
       their chance — left_semi);
    4. REPLACES the state (Catalog atomic swap, same mechanics as
       run_stream_counter_rate) with the retained rows: long windows
       older than one long_width behind the delta's newest can never
       be touched again (short windows finalize in watermark order),
       so state stays bounded by ~2 long windows x |keys| x
       (long/short) rows however old the stream is. The replace
       dedups on (key, window) — and the alert INPUT dedups the same
       way, so a replayed batch reconverges to the same state and the
       same decisions. The alert append is the one remaining
       at-least-once surface (duplicate alert ROWS, never wrong
       ones); the real target makes it an Iceberg MERGE on
       (key, window) for exactly-once."""
    from ..operators.aggregate import (
        _validate_aligned_widths,
        _win,
        burn_rate_from_short,
    )
    from ..sources.catalog import Catalog

    long_us = _validate_aligned_widths(short_width, long_width)

    stream = event_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    err = F.when(F.col(error_col), F.lit(1)).otherwise(F.lit(0))
    short = (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            _win(F.col(ts_col), short_width, None).alias("_w"),
            F.col(key_col),
        )
        .agg(F.sum(err).alias("errors"), F.count("*").alias("total"))
        .select(
            F.unix_micros(F.col("_w.start")).alias("window_start_us"),
            key_col,
            "errors",
            "total",
        )
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        delta = batch.transform(snapshot)
        if delta.isEmpty():
            return
        cat = Catalog(spark, state_root)
        state = (
            cat.read("short_rollup")
            if cat.exists("short_rollup")
            else delta.limit(0)
        )
        with_ws = lambda df: df.withColumn(  # noqa: E731
            "_ws", F.timestamp_micros(F.col("window_start_us"))
        )
        # state rows matter only inside the long windows this delta
        # touches (the long grain is a function of the short start)
        touched = (
            with_ws(delta)
            .select(_win("_ws", long_width, None).start.alias("_tl"))
            .distinct()
        )
        pruned = (
            with_ws(state)
            .withColumn("_sl", _win("_ws", long_width, None).start)
            .join(
                F.broadcast(touched), F.col("_sl") == F.col("_tl"), "left_semi"
            )
            .drop("_sl")
        )
        # dedup on (key, window) BEFORE totalling: on a replayed batch
        # the pruned state already contains this delta's windows (the
        # state replace committed, the checkpoint didn't), and a
        # doubled short would shift the long-window ratio enough to
        # flip an alert near the threshold — the replay must
        # reconverge on the ALERT input too, not just the state
        hist = (
            pruned.unionByName(with_ws(delta))
            .dropDuplicates([key_col, "window_start_us"])
            .drop("window_start_us")
        )
        alerts = burn_rate_from_short(
            hist, budget_ppm, long_width, short_factor, long_factor, key_col
        ).join(
            delta.select(key_col, "window_start_us"),
            [key_col, "window_start_us"],
            "left_semi",
        )
        _append_alerts(alerts, alerts_path)
        # retained state: only long windows >= one long_width behind
        # the newest delta window can still be touched (watermark
        # order); dedup on (key, window) makes a batch replay
        # reconverge instead of double-count
        horizon = (
            delta.agg(F.max("window_start_us").alias("_m"))
            .select((F.col("_m") - 2 * long_us).alias("_h"))
        )
        new_state = (
            state.unionByName(delta)
            .dropDuplicates([key_col, "window_start_us"])
            .join(F.broadcast(horizon))
            # null-horizon guard: an all-null-timestamp delta must
            # prune nothing, not NULL-out the compare and drop all
            # retained windows
            .filter(
                F.col("_h").isNull()
                | (F.col("window_start_us") >= F.col("_h"))
            )
            .drop("_h")
        )
        cat.write(new_state, "short_rollup")

    writer = (
        short.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_rate_limit(
    event_stream: DataFrame,
    state_root: str,
    out_root: str,
    checkpoint: str,
    max_per_window: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    width: str = "1 hour",
    available_now: bool = False,
):
    """Live per-key throttle: the streaming twin of
    ``templates.rate_limit``. The semantic difference is the admission
    ORDER, and it is inherent, not an implementation accident: a live
    shipper must decide per arrival, so it admits the first
    ``max_per_window`` rows per (key, window) in ARRIVAL order (within
    a micro-batch, (ts, id) — the batch operator's order — breaks
    ties), while the batch operator re-run over the full log admits
    the first N in (ts, id) order. Counts per grain agree exactly
    (both cap at N, both census-reconcile); the admitted SETS can
    differ when late rows with earlier timestamps arrive after a grain
    filled — the standard throttle trade-off, documented rather than
    hidden.

    State = an IDEMPOTENT admission log: one row per (key, window,
    batch_id) holding that batch's admitted count, replaced atomically
    per batch (Catalog swap). A grain's carried-in quota (_base) sums
    the log EXCLUDING the current batch_id, so a replayed micro-batch
    recomputes the same _base, re-derives the same decisions, and
    REPLACES its own log rows instead of double-counting (the same
    reconverge-on-replay contract as run_stream_burn_rate; the kept /
    census appends remain the at-least-once surface — duplicate ROWS
    on replay, never different ones — an Iceberg MERGE at the real
    target). The log is pruned to windows within 2 x width of the
    newest window the stream has admitted into (older windows are
    watermark-passed and can never fill further; a straggler past the
    horizon gets a fresh quota — the documented staleness trade-off),
    so state stays bounded by live grains x touching batches. NULL
    KEYS match their state rows null-safely — a NULL key is one grain,
    capped like any other, exactly as the batch operator's groupBy
    treats it. NULL event times are window-filtered by Spark's time
    window in BOTH twins (defined semantics); an all-null-timestamp
    batch therefore yields an empty census and a NULL horizon, which
    the prune guards against (prunes nothing) instead of NULLing the
    compare and wiping the admission log.

    Kept rows append to ``{out_root}/kept``; the census log appends
    per-batch (key, window, n_total, n_kept, n_dropped) deltas that
    SUM to the batch operator's census (counts are mergeable)."""
    from ..operators.aggregate import _width_us, _win
    from ..sources.catalog import Catalog

    if max_per_window < 1:
        raise ValueError(
            f"max_per_window must be >= 1, got {max_per_window}"
        )
    width_us = _width_us(width)

    stream = event_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.withColumn(
            "window_start_us",
            F.unix_micros(_win(ts_col, width, None).start),
        ).transform(snapshot)
        if batch.isEmpty():
            return
        cat = Catalog(spark, state_root)
        state = (
            cat.read("admitted")
            if cat.exists("admitted")
            else batch.select(key_col, "window_start_us").limit(0)
            .withColumn("batch_id", F.lit(0).cast("bigint"))
            .withColumn("n_kept", F.lit(0).cast("bigint"))
        )
        # carried-in quota per grain: the log EXCLUDING this batch_id —
        # a replay recomputes the same _base it saw the first time
        base = (
            state.filter(F.col("batch_id") != batch_id)
            .groupBy(
                F.col(key_col).alias("_sk"),
                F.col("window_start_us").alias("_sw"),
            )
            .agg(F.sum("n_kept").alias("_base0"))
        )
        from pyspark.sql import Window

        w = Window.partitionBy(key_col, "window_start_us").orderBy(
            F.col(ts_col), F.col(id_col)
        )
        ranked = (
            batch.withColumn("_rn", F.row_number().over(w))
            .join(
                base,
                F.col(key_col).eqNullSafe(F.col("_sk"))
                & F.col("window_start_us").eqNullSafe(F.col("_sw")),
                "left",
            )
            .withColumn("_base", F.coalesce(F.col("_base0"), F.lit(0)))
            .drop("_sk", "_sw", "_base0")
            .transform(snapshot)
        )
        kept = ranked.filter(F.col("_rn") + F.col("_base") <= max_per_window)
        kept.withColumn(
            "sample_rank", (F.col("_rn") + F.col("_base")).cast("int")
        ).drop("_rn", "_base").write.mode("append").parquet(f"{out_root}/kept")
        census_delta = (
            ranked.groupBy(key_col, "window_start_us", "_base")
            .agg(F.count("*").alias("n_total"))
            .select(
                key_col,
                "window_start_us",
                "n_total",
                F.least(
                    F.col("n_total"),
                    F.greatest(
                        F.lit(max_per_window) - F.col("_base"), F.lit(0)
                    ),
                ).alias("n_kept"),
            )
            .withColumn("n_dropped", F.col("n_total") - F.col("n_kept"))
            .transform(snapshot)
        )
        census_delta.write.mode("append").parquet(f"{out_root}/census")
        # replace this batch's own log rows (replay reconverges) and
        # prune grains past the 2 x width horizon behind the newest
        # window this batch touched (prune-less-never-more: a batch of
        # only-old windows computes a lower horizon and prunes nothing)
        horizon = (
            census_delta.agg(F.max("window_start_us").alias("_m"))
            .select((F.col("_m") - 2 * width_us).alias("_h"))
        )
        new_state = (
            state.filter(F.col("batch_id") != batch_id)
            .unionByName(
                census_delta.select(
                    key_col,
                    "window_start_us",
                    F.lit(batch_id).cast("bigint").alias("batch_id"),
                    F.col("n_kept"),
                )
            )
            .join(F.broadcast(horizon))
            # a batch whose every row has a NULL event time yields a
            # NULL horizon; without the _h null-guard the >= compare
            # is NULL for every real-window row and the whole
            # admission log would be silently dropped (quotas reset)
            .filter(
                F.col("_h").isNull()
                | F.col("window_start_us").isNull()
                | (F.col("window_start_us") >= F.col("_h"))
            )
            .drop("_h")
        )
        cat.write(new_state, "admitted")

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
