"""Validation operator (P4 analog): config-driven column constraints
with first-failing-rule reporting, evaluated without UDFs."""

from __future__ import annotations

from pyspark.sql import functions as F

from otel2pv_spark.operators import validate as v


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id string, event_type string, parent_event_id string, "
        "job_name string, turn_idx int"
    )


def test_rules_first_failure_wins(spark):
    rules = v.default_event_rules()
    rows = [
        ("e:1", "view", "", "job", 0),              # valid
        ("", "view", "", "job", 1),                 # required event_id
        ("e 2", "view", "", "job", 2),              # pattern (space)
        ("e:3", "nope", "", "job", 3),              # enum
        ("e:4", "click", "bad id", "job", 4),       # optional pattern
        ("e:5", "click", "", "j" * 65, 5),          # max_length
        ("", "nope", "", "", 6),                    # both bad -> first rule
    ]
    out = {r.turn_idx: r.validation_error
           for r in v.validate(_df(spark, rows), rules).collect()}
    assert out[0] is None
    assert out[1] == "invalid_event_id"
    assert out[2] == "invalid_event_id"
    assert out[3] == "invalid_event_type"
    assert out[4] == "invalid_parent_event_id"
    assert out[5] == "invalid_job_name"
    assert out[6] == "invalid_event_id"


def test_split_valid_partitions_rows(spark):
    rules = v.default_event_rules()
    rows = [("e:1", "view", "", "", 0), ("", "view", "", "", 1)]
    good, bad = v.split_valid(v.validate(_df(spark, rows), rules))
    assert good.count() == 1 and bad.count() == 1


def test_validate_stays_in_codegen(spark):
    """No UDF: the fused CASE must evaluate inside codegen (no
    BatchEvalPython / ArrowEvalPython nodes)."""
    rules = v.default_event_rules()
    df = v.validate(_df(spark, [("e:1", "view", "", "", 0)]), rules)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
