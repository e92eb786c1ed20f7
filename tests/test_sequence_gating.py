"""Regression tests: reject rows must behave exactly as if filtered out
before sequencing (the ok_col contract) — a reject sharing an event_id
with a valid row must not outrank it in the duplicate window, and a
reject matching a groupApplies identifying predicate must not donate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from otel2pv_spark.operators import sequence as seq_op

SCHEMA = (
    "conv_id string, turn_idx int, event_id string, parent_event_id string, "
    "role string, text string, tool string, job_name string, event_type string, "
    "parse_ok boolean"
)


def _df(spark):
    rows = [
        # reject at turn 0 whose id regex matched ("X") — shares the id of
        # the VALID row at turn 2, and carries a groupApplies-matching
        # (event_type='error', job_name='BAD') payload
        ("c1", 0, "X", "", "user", "garbled", "", "BAD", "error", False),
        ("c1", 1, "A", "", "user", "ok", "", "", "view", True),
        ("c1", 2, "X", "A", "assistant", "ok", "", "", "view", True),
        ("c1", 3, "Y", "X", "tool", "ok", "", "", "view", True),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _prev_map(out):
    return {
        r.turn_idx: (r.prev_event_id, r.is_duplicate)
        for r in out.filter(F.col("parse_ok")).collect()
    }


def test_reject_does_not_outrank_valid_duplicate(spark):
    out = seq_op.sequence_window(
        _df(spark), out_col="prev_event_id", array_mode=False, ok_col="parse_ok"
    )
    got = _prev_map(out)
    # valid turn 2 ("X") is canonical — NOT a duplicate of the reject —
    # and donates its id to turn 3
    assert got[2] == ("A", False)
    assert got[3] == ("X", False)
    assert out.filter(F.col("parse_ok")).filter("is_duplicate").count() == 0


def test_reject_does_not_outrank_valid_duplicate_salted(spark):
    out = seq_op.sequence_window_salted(
        _df(spark), block_size=2,
        out_col="prev_event_id", array_mode=False, ok_col="parse_ok",
    )
    got = _prev_map(out)
    assert got[2] == ("A", False)
    assert got[3] == ("X", False)


def test_reject_does_not_trip_conflict_flag(spark):
    # the reject's payload differs from the valid "X" row — with the ok
    # gate the conversation must still be sequenceable
    out = seq_op.sequence_window(
        _df(spark), out_col="prev_event_id", array_mode=False,
        ok_col="parse_ok", dup_compare_cols=("role", "text", "tool"),
    )
    assert all(r.sequenceable for r in out.filter(F.col("parse_ok")).collect())


def test_group_applies_reject_not_donor(spark):
    out = seq_op.group_applies(
        _df(spark), "job_name", "event_type", "error", ok_col="parse_ok"
    )
    vals = {r.turn_idx: r.job_name for r in out.filter(F.col("parse_ok")).collect()}
    assert vals == {1: "", 2: "", 3: ""}


def test_group_applies_valid_donor_still_applies(spark):
    df = _df(spark).withColumn(
        "job_name",
        F.when(F.col("turn_idx") == 2, F.lit("GOOD")).otherwise(F.col("job_name")),
    ).withColumn(
        "event_type",
        F.when(F.col("turn_idx") == 2, F.lit("error")).otherwise(F.col("event_type")),
    )
    out = seq_op.group_applies(df, "job_name", "event_type", "error", ok_col="parse_ok")
    vals = {r.turn_idx: r.job_name for r in out.collect()}
    assert vals[1] == "GOOD" and vals[3] == "GOOD"
