"""Skew handling: sequence_window_salted must be output-identical to
sequence_window on every semantic edge (duplicates, conflicting
duplicates, gaps, string/array modes), including the hot-conversation
fixture (one conversation 100x the median), with per-task work bounded
by the block size.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otel2pv_spark import datagen
from otel2pv_spark.operators import parse as parse_op
from otel2pv_spark.operators import sequence as seq_op


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


CMP = ["conv_id", "turn_idx", "event_id", "previous_event_ids", "is_duplicate", "sequenceable"]


@pytest.fixture(scope="module")
def hot_parsed(spark):
    # one hot conversation (1200 turns) among 50 normal ones (~12);
    # malformed rows create turn gaps after the rejects split
    tr = datagen.synth_transcripts(spark, n_convs=50, avg_turns=12, hot_convs=1)
    # add same-turn duplicates (equal payload) and a conflicting
    # duplicate (different text) to exercise every dup path
    conv_n = F.substring("conv_id", 6, 8).cast("int")
    dup_equal = tr.filter((F.col("turn_idx") == 5) & (conv_n % 7 == 0))
    dup_conflict = (
        tr.filter((F.col("turn_idx") == 2) & (conv_n % 13 == 0))
        .withColumn("text", F.concat(F.col("text"), F.lit(" CONFLICT")))
    )
    tr = tr.unionByName(dup_equal).unionByName(dup_conflict)
    good, _ = parse_op.split_rejects(parse_op.parse(tr))
    return good.persist()


@pytest.mark.parametrize("block_size", [7, 100])
@pytest.mark.parametrize("array_mode,gap_reset", [(True, True), (False, False)])
def test_salted_matches_unsalted(hot_parsed, block_size, array_mode, gap_reset):
    kwargs = dict(
        array_mode=array_mode,
        gap_reset=gap_reset,
        dup_compare_cols=("role", "text", "tool"),
    )
    plain = seq_op.sequence_window(hot_parsed, **kwargs)
    salted = seq_op.sequence_window_salted(hot_parsed, block_size, **kwargs)
    assert _rows(plain, CMP) == _rows(salted, CMP)


def test_hot_conv_covered(hot_parsed):
    """The fixture really is skewed: the hot conversation is >50x the
    median, and a block size of 100 splits it into >10 blocks."""
    sizes = hot_parsed.groupBy("conv_id").count().collect()
    by_size = sorted(r["count"] for r in sizes)
    assert by_size[-1] > 50 * by_size[len(by_size) // 2]
    assert by_size[-1] > 1000


def test_salted_in_pipeline(spark, tmp_path):
    """PipelineConfig.hot_block_size routes through the salted path and
    yields the same sink counts as the default path."""
    from otel2pv_spark.plans import pipeline

    tr = datagen.synth_transcripts(spark, n_convs=30, avg_turns=12, hot_convs=1)
    base, _ = pipeline.build_sequenced(
        tr, datagen.tool_meta(spark), datagen.role_meta(spark),
        pipeline.PipelineConfig(),
    )
    salted, _ = pipeline.build_sequenced(
        tr, datagen.tool_meta(spark), datagen.role_meta(spark),
        pipeline.PipelineConfig(hot_block_size=64),
    )
    cols = ["conv_id", "turn_idx", "event_id", "previous_event_ids", "sink"]
    assert _rows(base, cols) == _rows(salted, cols)


def test_conflicting_dup_gates_whole_conv(hot_parsed):
    out = seq_op.sequence_window_salted(
        hot_parsed, 7, dup_compare_cols=("role", "text", "tool")
    )
    flags = (
        out.groupBy("conv_id")
        .agg(
            F.max(F.col("sequenceable").cast("int")).alias("mx"),
            F.min(F.col("sequenceable").cast("int")).alias("mn"),
        )
        .collect()
    )
    # sequenceable is conversation-uniform
    assert all(r["mx"] == r["mn"] for r in flags)
    unseq = {r["conv_id"] for r in out.filter(~F.col("sequenceable")).select("conv_id").distinct().collect()}
    assert unseq  # the conflicting-dup convs exist
    # unsequenceable conversations carry NO prev links at all
    assert (
        out.filter(~F.col("sequenceable"))
        .filter(F.col("previous_event_ids").isNotNull())
        .count()
        == 0
    )


def test_chain_verify_salted_matches(spark):
    from otel2pv_spark.operators import verify as verify_op

    tr = datagen.synth_transcripts(spark, n_convs=40, avg_turns=12, hot_convs=1)
    parsed = parse_op.parse(tr)
    plain = verify_op.chain_verify(parsed)
    for block in (5, 64):
        salted = verify_op.chain_verify_salted(parsed, block)
        assert _rows(plain, ["conv_id", "n_turns", "verified"]) == _rows(
            salted, ["conv_id", "n_turns", "verified"]
        )
    # fixture exercises both verdicts
    verdicts = {r["verified"] for r in plain.collect()}
    assert verdicts == {True, False}
