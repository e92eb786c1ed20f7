"""DLQ replay: fixing the extractor config and re-driving the parked
rows must converge the tables to a from-scratch run with the fixed
config (the reference's reprocess-the-dead-letter workflow,
Server/consumers.go:776-790, in batch form)."""

from __future__ import annotations

from otel2pv_spark import datagen
from otel2pv_spark.operators import parse as parse_op
from otel2pv_spark.plans import pipeline
from otel2pv_spark.sources.catalog import Catalog


def _strict_rules():
    """A broken config: only view/click/purchase/signup event types
    parse; 'error' turns land in the DLQ."""
    rules = parse_op.default_rules()
    return [
        parse_op.ExtractionRule(
            "event_type",
            "event=(view|click|purchase|signup)",
            required=True,
        )
        if r.name == "event_type"
        else r
        for r in rules
    ]


def _table(cat, name, cols):
    rows = []
    for r in cat.read(name).select(*cols).collect():
        rows.append(
            tuple(
                tuple(v) if isinstance(v, list) else v
                for v in (r[c] for c in cols)
            )
        )
    return sorted(rows)


def test_replay_converges_to_fixed_config_run(spark, sf_dir, tmp_path):
    tr = datagen.transcripts_from_events(spark, sf_dir)
    cols = ["conv_id", "turn_idx", "sink", "previous_event_ids", "verified"]

    # 1. broken config: 'error' turns all park in the DLQ
    broken = pipeline.PipelineConfig(
        out_root=str(tmp_path / "out"),
        run_id="r1",
        parse_rules=_strict_rules(),
    )
    pipeline.run(spark, tr, broken)
    cat = Catalog(spark, broken.out_root)
    rejects_broken = cat.read("rejects").count()
    reasons = {
        r.reject_reason
        for r in cat.read("rejects").select("reject_reason").distinct().collect()
    }
    assert rejects_broken > 0 and "invalid_parse" in reasons

    # 2. replay under the FIXED (default) config
    fixed = pipeline.PipelineConfig(
        out_root=broken.out_root, run_id="r1-fix"
    )
    res = pipeline.replay_rejects(spark, tr, fixed)
    assert res["rejects_before_convs"] > 0

    # 3. tables now equal a from-scratch run with the fixed config
    fresh = pipeline.PipelineConfig(
        out_root=str(tmp_path / "fresh"), run_id="r2"
    )
    pipeline.run(spark, tr, fresh)
    fresh_cat = Catalog(spark, fresh.out_root)

    assert _table(cat, "sequenced_events", cols) == _table(
        fresh_cat, "sequenced_events", cols
    )
    assert _table(cat, "rejects", ["conv_id", "turn_idx"]) == _table(
        fresh_cat, "rejects", ["conv_id", "turn_idx"]
    )
    # only the genuinely-garbled rows remain parked
    assert res["rejects_after_rows"] == fresh_cat.read("rejects").count()
    assert res["rejects_after_rows"] < rejects_broken


def test_replay_noop_when_dlq_empty(spark, tmp_path):
    df = datagen.transcripts_from_events(spark, "/root/testdata/sf0.001")
    clean = df.filter("text like 'event=%'")
    cfg = pipeline.PipelineConfig(out_root=str(tmp_path / "o"), run_id="c1")
    pipeline.run(spark, clean, cfg)
    cat = Catalog(spark, cfg.out_root)
    assert cat.read("rejects").count() == 0
    res = pipeline.replay_rejects(
        spark, clean,
        pipeline.PipelineConfig(out_root=cfg.out_root, run_id="c1-fix"),
    )
    assert res == {"rejects_before_convs": 0, "recomputed_convs": 0}
