"""Unit tests for the one-pass declarative data-quality gate."""

from __future__ import annotations

import pytest

from otel2pv_spark.operators import checks as ck


def _suite_result(spark, df, suite, refs=None):
    return {
        r.check_name: r for r in ck.run_checks(df, suite, refs=refs).collect()
    }


def test_checks_all_kinds_golden(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "a", "x", "t1"),
            (1, 10, "a", "x", "t1"),      # dup key
            (2, -5, "b", "x", "t9"),      # min violation + unknown ref
            (None, 20, "zz", None, None), # null id, bad domain, null text
        ],
        "id int, v int, cat string, txt string, fk string",
    )
    ref = spark.createDataFrame([("t1",), ("t2",)], "fk string")
    suite = [
        ck.Check("id_nn", "not_null", column="id"),
        ck.Check("key_uq", "unique", columns=("id", "v")),
        ck.Check("cat_dom", "accepted_values", column="cat", values=("a", "b")),
        ck.Check("v_min", "min", column="v", limit=0),
        ck.Check("v_max", "max", column="v", limit=15),
        ck.Check("txt_re", "matches", column="txt", pattern="^x$"),
        ck.Check("fk_ok", "ref_integrity", column="fk", ref="dim"),
        ck.Check("floor", "row_count_min", limit=10),
    ]
    out = _suite_result(spark, df, suite, refs={"dim": ref})
    assert len(out) == 8

    assert (out["id_nn"].rows, out["id_nn"].violations) == (4, 1)
    # unique examines the 3 non-null-key rows; 2 distinct keys -> 1 excess
    assert (out["key_uq"].rows, out["key_uq"].violations) == (3, 1)
    assert out["cat_dom"].violations == 1          # 'zz'
    assert out["v_min"].violations == 1            # -5
    assert out["v_max"].violations == 1            # 20
    assert out["txt_re"].violations == 1           # NULL text violates
    assert out["fk_ok"].violations == 1            # 't9'; NULL FK passes
    assert (out["floor"].rows, out["floor"].violations) == (4, 1)
    assert not any(r.passed for r in out.values())


def test_checks_pass_and_empty_table(spark):
    df = spark.createDataFrame([(1, "a")], "id int, cat string")
    suite = [
        ck.Check("id_nn", "not_null", column="id"),
        ck.Check("key_uq", "unique", columns=("id",)),
        ck.Check("floor", "row_count_min", limit=1),
    ]
    out = _suite_result(spark, df, suite)
    assert all(r.passed for r in out.values())

    empty = df.filter("id < 0")
    out = _suite_result(spark, empty, suite)
    assert out["id_nn"].passed and out["key_uq"].passed
    assert not out["floor"].passed
    assert out["floor"].rows == 0 and out["floor"].violations == 1


def test_checks_unknown_kind_and_ref(spark):
    with pytest.raises(ValueError):
        ck.Check("bad", "nope", column="x")
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError):
        ck.run_checks(
            df, [ck.Check("r", "ref_integrity", column="id", ref="missing")]
        )


def test_checks_single_pass_plan(spark):
    """The whole suite must evaluate as ONE aggregation over one scan:
    exactly one non-broadcast exchange (the scalar-row merge), dims
    broadcast, partial aggregation present."""
    df = spark.createDataFrame(
        [(1, "t1"), (2, "t2")], "id int, fk string"
    )
    ref = spark.createDataFrame([("t1",)], "fk string")
    suite = [
        ck.Check("id_nn", "not_null", column="id"),
        ck.Check("key_uq", "unique", columns=("id",)),
        ck.Check("fk_ok", "ref_integrity", column="fk", ref="dim"),
        ck.Check("floor", "row_count_min", limit=1),
    ]
    out = ck.run_checks(df, suite, refs={"dim": ref})
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the INPUT is scanned exactly once (dims scan separately, tiny)
    assert plan.count("Scan ExistingRDD[id#") == 1, plan
    # one scalar merge; the only other non-broadcast exchange is the
    # count-distinct key repartition Spark expands unique checks into
    # (exact distinct's correct two-phase shape)
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_sum" in plan, plan
