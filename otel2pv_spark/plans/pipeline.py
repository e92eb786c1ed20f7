"""The full DAG: parse → enrich → verify → sequence → route → aggregate.

One Catalyst plan end-to-end with exactly ONE data shuffle (on conv_id,
shared by the verify window and the sequence window — same partitioning
expression, so Exchange reuse keeps it to a single exchange) plus the
tiny metric aggregations. Dims broadcast. The routed output is written
once, dynamic-partitioned by sink (no per-sink re-scan).

This is the lifecycle contrast documented in SURVEY §3.5; the stages
correspond 1:1 to the reference's three services plus routing/metrics.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import datagen
from ..operators import aggregate as agg_op
from ..operators import enrich as enrich_op
from ..operators import parse as parse_op
from ..operators import route as route_op
from ..operators import sequence as seq_op
from ..operators import verify as verify_op
from ..sources.catalog import Catalog
from ..sources.manifest import RunManifest

KNOWN_SINKS = [
    "sink_search", "sink_code", "sink_db", "sink_misc",
    "sink_user", "sink_assistant", "sink_tool",
]

OUTPUT_COLS = [
    "conv_id", "turn_idx", "role", "tool", "sink",
    "event_id", "event_type", "parent_event_id",
    "job_name", "application_name",
    "previous_event_ids", "verified", "sequenceable", "is_duplicate",
    "text",
]


@dataclass
class PipelineConfig:
    """Mirrors the reference's AppConfig surface
    (Server/setupServers.go:80-139; Sequencer config sequencer.go:182-251)."""

    out_root: str = "/tmp/otel2pv_out"
    use_pandas_parse: bool = False
    seq_array_mode: bool = True            # outputAppSequenceFieldType, sequencer.go:251
    seq_out_col: str = "previous_event_ids"
    seq_id_map_col: str | None = None      # outputAppFieldSequenceIdMap
    gap_reset: bool = True
    group_applies: list[tuple[str, str, str]] = field(default_factory=list)
    # (share_col, identifying_col, identifying_value) — sequencer.go:124-170
    # hot-conversation skew path: when set, the sequence stage windows
    # over (conv_id, floor(turn_idx / hot_block_size)) blocks with a
    # carry-in join instead of whole-conversation partitions — bounds
    # per-task work by block size (sequence_window_salted)
    hot_block_size: int | None = None
    run_id: str | None = None


def _apply_verify(parsed: DataFrame, cfg: PipelineConfig) -> DataFrame:
    if cfg.hot_block_size:
        ver = verify_op.chain_verify_salted(parsed, cfg.hot_block_size)
    else:
        ver = verify_op.chain_verify(parsed)
    return ver.select("conv_id", "verified")


def _apply_sequence(enriched: DataFrame, cfg: PipelineConfig) -> DataFrame:
    kwargs = dict(
        seq_id_map_col=cfg.seq_id_map_col,
        out_col=cfg.seq_out_col,
        array_mode=cfg.seq_array_mode,
        gap_reset=cfg.gap_reset,
        dup_compare_cols=("role", "text", "tool"),
    )
    if cfg.hot_block_size:
        seq = seq_op.sequence_window_salted(enriched, cfg.hot_block_size, **kwargs)
    else:
        seq = seq_op.sequence_window(enriched, **kwargs)
    for share, ident, value in cfg.group_applies:
        seq = seq_op.group_applies(seq, share, ident, value)
    return seq


def build_stages(
    transcripts: DataFrame,
    tool_meta: DataFrame,
    role_meta: DataFrame,
    cfg: PipelineConfig,
) -> dict[str, DataFrame]:
    """Lazy stage plans, exposed individually so the executor can
    persist the two reused intermediates (``parsed`` feeds the good
    path, the rejects path AND the verify branch; ``seq`` feeds the
    fanout write, route-rejects, metrics and lineage — Catalyst does
    not dedupe shared DataFrame subplans, so without persisting these
    each consumer would recompute the whole upstream DAG)."""
    parsed = parse_op.parse(transcripts, use_pandas=cfg.use_pandas_parse)
    good, parse_rejects = parse_op.split_rejects(parsed)

    enriched = enrich_op.enrich(good, tool_meta, role_meta)

    # per-conv verification flag (straight-line chain form), joined back
    # on the same conv_id partitioning
    ver = _apply_verify(parsed, cfg)
    enriched = enriched.join(ver, "conv_id", "left")

    seq = _apply_sequence(enriched, cfg)

    return {"parsed": parsed, "parse_rejects": parse_rejects, "seq": seq}


def build_sequenced(
    transcripts: DataFrame,
    tool_meta: DataFrame,
    role_meta: DataFrame,
    cfg: PipelineConfig,
) -> tuple[DataFrame, DataFrame]:
    """Pure (lazy) plan: returns (sequenced_routable, rejects)."""
    st = build_stages(transcripts, tool_meta, role_meta, cfg)
    routable, route_rejects = route_op.route(st["seq"], KNOWN_SINKS)
    routable = routable.select(*OUTPUT_COLS)

    rejects = st["parse_rejects"].select(
        "conv_id", "turn_idx", "text", "reject_reason"
    ).unionByName(
        route_rejects.select("conv_id", "turn_idx", "text", "reject_reason")
    )
    return routable, rejects


def run(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: PipelineConfig,
) -> dict:
    """Execute + persist all outputs; resumable via the run manifest."""
    run_id = cfg.run_id or uuid.uuid4().hex[:12]
    cat = Catalog(spark, cfg.out_root)
    man = RunManifest(cfg.out_root, run_id)
    t0 = time.time()

    steps = ("fanout", "rejects", "metrics", "lineage")
    if all(man.is_committed(s) for s in steps):
        # fully-resumed run: nothing to recompute — answer from _metrics
        n_rows = sum(r.rows for r in cat.read("_metrics").collect())
        return {
            "run_id": run_id,
            "rows": n_rows,
            "wall_sec": time.time() - t0,
            "turns_per_sec": 0.0,
            "committed": man.committed_steps(),
            "resumed": True,
        }

    tool_meta = datagen.tool_meta(spark)
    role_meta = datagen.role_meta(spark)

    st = build_stages(transcripts, tool_meta, role_meta, cfg)

    # Two persists, each reused by ≥2 consumers (see build_stages doc):
    # on a cluster these would be Iceberg staging tables; locally
    # MEMORY_AND_DISK persist() suffices.
    parsed = st["parsed"].persist()
    seq = None
    try:
        # rebuild the downstream plan on TOP of the persisted parsed
        good, parse_rejects = parse_op.split_rejects(parsed)
        enriched = enrich_op.enrich(good, tool_meta, role_meta)
        ver = _apply_verify(parsed, cfg)
        enriched = enriched.join(ver, "conv_id", "left")
        seq = _apply_sequence(enriched, cfg).persist()

        routable, route_rejects = route_op.route(seq, KNOWN_SINKS)
        routable = routable.select(*OUTPUT_COLS)
        rejects = parse_rejects.select(
            "conv_id", "turn_idx", "text", "reject_reason"
        ).unionByName(
            route_rejects.select("conv_id", "turn_idx", "text", "reject_reason")
        )

        n_rows = 0
        if not man.is_committed("fanout"):
            route_op.write_fanout(routable, cat.path("sequenced_events"))
            man.commit("fanout", {"path": cat.path("sequenced_events")})
        if not man.is_committed("rejects"):
            cat.write(rejects, "rejects")
            man.commit("rejects")
        if not man.is_committed("metrics"):
            cat.write(agg_op.metrics(routable, run_id), "_metrics")
            man.commit("metrics")
        if not man.is_committed("lineage"):
            cat.write(agg_op.lineage(routable, run_id, "sequence"), "_lineage")
            man.commit("lineage")
        n_rows = routable.count()
    finally:
        parsed.unpersist()
        if seq is not None:
            seq.unpersist()

    wall = time.time() - t0
    return {
        "run_id": run_id,
        "rows": n_rows,
        "wall_sec": wall,
        "turns_per_sec": n_rows / wall if wall > 0 else 0.0,
        "committed": man.committed_steps(),
    }


def run_from_events(spark: SparkSession, sf_dir: str, cfg: PipelineConfig) -> dict:
    return run(spark, datagen.transcripts_from_events(spark, sf_dir), cfg)
