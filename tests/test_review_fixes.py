"""Regression tests for review findings: incremental reject merge,
empty-rejects commit, DLQ raw-record preservation, tree/window duplicate
conflict parity, resume metrics run_id filtering, curation misconfig."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from otel2pv_spark import datagen
from otel2pv_spark.plans import pipeline


def _rows(df, cols):
    out = []
    for r in df.select(*cols).collect():
        out.append(
            tuple(
                tuple(v) if isinstance(v, list) else v
                for v in (r[c] for c in cols)
            )
        )
    return sorted(out)


def test_incremental_reject_merge(spark, sf_dir, tmp_path):
    """Changed conversations whose recompute REMOVES reject rows (their
    garbled turns are gone in the new snapshot) and one that GAINS a
    reject must both merge correctly — the incremental rejects table
    must equal a fresh full run's."""
    tr = datagen.transcripts_from_events(spark, sf_dir)
    rej_convs = sorted(
        r.conv_id
        for r in tr.filter(F.col("text").startswith("garbled"))
        .select("conv_id").distinct().limit(2).collect()
    )
    assert rej_convs, "fixture must contain garbled rows"
    clean_conv = (
        tr.select("conv_id").distinct()
        .join(
            tr.filter(F.col("text").startswith("garbled"))
            .select("conv_id").distinct(),
            "conv_id",
            "left_anti",
        )
        .orderBy("conv_id").limit(1).collect()[0].conv_id
    )
    changed = rej_convs + [clean_conv]

    pipeline.run(
        spark, tr,
        pipeline.PipelineConfig(out_root=str(tmp_path / "incr"), run_id="base"),
    )

    # new snapshot: garbled turns of rej_convs removed; one turn of the
    # clean conversation garbled
    modified = tr.filter(
        ~(F.col("conv_id").isin(rej_convs) & F.col("text").startswith("garbled"))
    ).withColumn(
        "text",
        F.when(
            (F.col("conv_id") == clean_conv) & (F.col("turn_idx") == 1),
            F.lit("garbled {}"),
        ).otherwise(F.col("text")),
    )

    pipeline.run_incremental(
        spark, modified,
        pipeline.PipelineConfig(out_root=str(tmp_path / "incr"), run_id="delta"),
        changed,
    )
    pipeline.run(
        spark, modified,
        pipeline.PipelineConfig(out_root=str(tmp_path / "full"), run_id="fresh"),
    )

    rej_cols = ["conv_id", "turn_idx", "reject_reason"]
    ra = spark.read.parquet(str(tmp_path / "incr" / "rejects"))
    rb = spark.read.parquet(str(tmp_path / "full" / "rejects"))
    assert _rows(ra, rej_cols) == _rows(rb, rej_cols)
    # the removed convs' old rejects are gone, the new one is present
    got_convs = {r.conv_id for r in ra.select("conv_id").distinct().collect()}
    assert clean_conv in got_convs
    assert not (set(rej_convs) & got_convs)
    # _lineage was refreshed by the incremental run and reconciles with
    # the merged table
    lin = spark.read.parquet(str(tmp_path / "incr" / "_lineage"))
    ev = spark.read.parquet(str(tmp_path / "incr" / "sequenced_events"))
    assert sum(r.rows for r in lin.collect()) == ev.count()
    assert {r.run_id for r in lin.collect()} == {"delta"}


def test_empty_rejects_table_is_readable(spark, sf_dir, tmp_path):
    """A run whose input has no invalid rows must still commit a
    READABLE (empty, schema'd) rejects table."""
    tr = datagen.transcripts_from_events(spark, sf_dir).filter(
        ~F.col("text").startswith("garbled")
    )
    pipeline.run(
        spark, tr,
        pipeline.PipelineConfig(out_root=str(tmp_path / "clean"), run_id="r1"),
    )
    rej = spark.read.parquet(str(tmp_path / "clean" / "rejects"))
    assert rej.count() == 0
    assert "reject_reason" in rej.columns


def test_resume_metrics_filtered_by_run_id(spark, sf_dir, tmp_path):
    """A resumed run must report ITS OWN row counts even after another
    run overwrote _metrics for the same out_root."""
    from otel2pv_spark.sources.catalog import Catalog

    tr = datagen.transcripts_from_events(spark, sf_dir)
    cfg = pipeline.PipelineConfig(out_root=str(tmp_path / "res"), run_id="a")
    first = pipeline.run(spark, tr, cfg)

    # simulate a later run replacing _metrics with different counts
    cat = Catalog(spark, cfg.out_root)
    cat.write(
        spark.createDataFrame(
            [("b", "sink_user", 999999)], "run_id string, sink string, rows bigint"
        ).unionByName(cat.read("_metrics")),
        "_metrics",
    )
    resumed = pipeline.run(spark, tr, cfg)
    assert resumed["resumed"]
    assert resumed["rows"] == first["rows"]


def test_formats_missing_key_preserves_record(spark, tmp_path):
    """A decoded-but-keyless row must land in the DLQ with its content
    reconstructed, not a NULL raw_record."""
    import json
    import os

    from otel2pv_spark.sources.formats import read_with_dlq

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    with open(f"{src}/a.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "ok", "lang": "en", "source": "s"}) + "\n")
        f.write(json.dumps({"text": "no id here", "lang": "en", "source": "s"}) + "\n")
        f.write("{not json\n")
    good, rejects = read_with_dlq(spark, src, fmt="jsonl", key_col="doc_id")
    assert good.count() == 1
    got = {r.reject_reason: r.raw_record for r in rejects.collect()}
    assert "{not json" in got["decode_error"]
    assert "no id here" in got["missing_key"]


def _mk_transcripts(spark, rows):
    base = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (conv, idx, "user", text, "", base + timedelta(seconds=30 * idx))
            for conv, idx, text in rows
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_dup_conflict_parity_window_vs_tree(spark):
    """A duplicated event_id with a DIFFERENT payload must make the
    conversation unsequenceable in BOTH modes (the kernel's deep
    compare and the window path's dup_compare_cols now agree)."""
    def line(eid, parent, etype="view"):
        return f"event={etype} id={eid} parent={parent} job=job-0 app=app-0 :: {{}}"

    rows = [
        ("c1", 0, line("c1:0", "-")),
        ("c1", 1, line("c1:1", "c1:0")),
        # duplicate of c1:1 with a conflicting payload (event_type)
        ("c1", 2, line("c1:1", "c1:0", etype="error")),
        # c2: equal duplicate — stays sequenceable
        ("c2", 0, line("c2:0", "-")),
        ("c2", 1, line("c2:1", "c2:0")),
    ]
    tr = _mk_transcripts(spark, rows)
    tool_meta = datagen.tool_meta(spark)
    role_meta = datagen.role_meta(spark)

    results = {}
    for mode, cfg in (
        ("window", pipeline.PipelineConfig()),
        ("tree", pipeline.PipelineConfig(tree_mode=True, tree_buckets=4)),
    ):
        out = pipeline.build_single_pass(tr, tool_meta, role_meta, cfg)
        results[mode] = {
            (r.conv_id, r.turn_idx): (r.sequenceable, r.previous_event_ids)
            for r in out.collect()
        }
    for mode in ("window", "tree"):
        got = results[mode]
        assert got[("c1", 0)][0] is False, mode
        assert all(got[("c1", i)][1] is None for i in range(3)), mode
        assert got[("c2", 1)][0] is True, mode
        assert got[("c2", 1)][1] == ["c2:0"], mode
    assert results["window"] == results["tree"]


def test_curation_sampling_misconfig_fails_loudly(spark):
    from otel2pv_spark.plans import curation

    docs = spark.createDataFrame([(1, "a b c", "s")], "doc_id long, text string, source string")
    ev = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="silently no-op"):
        curation.build_audit(
            docs, ev, curation.CurationConfig(strata_col="source")
        )
    with pytest.raises(ValueError, match="require strata_col"):
        curation.build_audit(
            docs, ev, curation.CurationConfig(temperature_alpha=0.5)
        )
