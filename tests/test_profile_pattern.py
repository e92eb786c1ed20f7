"""Unit tests for profiling, drift, anomaly flags, and pattern ops."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from otel2pv_spark.operators import pattern as pat
from otel2pv_spark.operators import profile as prof
from otel2pv_spark.operators.aggregate import latency_stats


def test_profile_table_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "aa", 2.5, datetime.datetime(2024, 1, 1, 0, 0, 0, 123456)),
            (2, "bbbb", None, datetime.datetime(2024, 1, 2)),
            (None, None, -1.0, None),
            (2, "aa", 4.0, datetime.datetime(2024, 1, 1)),
        ],
        "i int, s string, d double, t timestamp_ntz",
    )
    out = {r.column: r for r in prof.profile_table(df).collect()}
    assert set(out) == {"i", "s", "d", "t"}
    i = out["i"]
    assert (i.n_rows, i.n_null, i.n_distinct) == (4, 1, 2)
    assert (i.min_num, i.max_num) == (1.0, 2.0)
    assert i.min_str is None and i.avg_len is None
    s = out["s"]
    assert (s.n_null, s.n_distinct, s.min_str, s.max_str) == (
        1, 2, "aa", "bbbb",
    )
    assert abs(s.avg_len - (2 + 4 + 2) / 3) < 1e-6  # rounded to 6 places
    t = out["t"]
    # row 4's exact-midnight ts is the min; micros format zero-padded
    assert t.min_str == "2024-01-01 00:00:00.000000"
    assert t.max_str == "2024-01-02 00:00:00.000000"
    # non-midnight micros survive the format: max over rows 1+3 only
    sub = prof.profile_table(df.filter("i = 1"), columns=["t"]).collect()[0]
    assert sub.min_str == "2024-01-01 00:00:00.123456"
    d = out["d"]
    assert (d.min_num, d.max_num, d.n_null) == (-1.0, 4.0, 1)


def test_profile_drift_statuses_and_flags(spark):
    cur_df = spark.createDataFrame(
        [(1, "x", None), (2, "y", "p"), (3, "z", "q")],
        "a int, b string, only_cur string",
    )
    ref_df = spark.createDataFrame(
        [(1, "x", 1.0), (1, "x", 2.0)],
        "a int, b string, only_ref double",
    )
    cur = prof.profile_table(cur_df)
    ref = prof.profile_table(ref_df)
    out = {r.column: r for r in prof.profile_drift(cur, ref).collect()}
    assert out["only_cur"].status == "added"
    assert out["only_ref"].status == "removed"
    assert out["a"].status == "both"
    # cur a-range [1,3] escapes ref [1,1]
    assert out["a"].range_drift
    # distinct rate: cur 3/3 vs ref 1/2 → |1 - 0.5| > 0.5? no (equal) →
    # use the default 0.5 threshold boundary: exactly at it fails (>)
    assert not out["a"].distinct_drift
    # added/removed rows never flag drift
    assert not out["only_cur"].range_drift
    assert not out["only_ref"].null_drift


def test_profile_drift_null_and_dtype(spark):
    cur_df = spark.createDataFrame([(None,), (1,), (2,), (3,)], "a int")
    ref_df = spark.createDataFrame([(1.0,), (2.0,)], "a double")
    out = prof.profile_drift(
        prof.profile_table(cur_df), prof.profile_table(ref_df),
        null_drift_ppm=100_000,
    ).collect()[0]
    assert out.dtype_drift  # int vs double
    assert out.null_drift   # 25% nulls vs 0% > 10%


def test_anomaly_flags_golden(spark):
    # constant 10s then a spike; trail=3
    rows = [("k", i, 10) for i in range(5)] + [("k", 5, 40), ("k", 6, 10)]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    out = {
        r.t: r
        for r in prof.anomaly_flags(
            df, "v", by="k", order_col="t", trail=3, nsigma=3
        ).collect()
    }
    # first 3 rows: no full trailing window → never anomalous
    assert not out[0].anomaly and out[0].trail_n == 0
    assert not out[2].anomaly and out[2].trail_n == 2
    # constant baseline, constant value → fine
    assert not out[3].anomaly and out[3].trail_n == 3
    # constant baseline (zero variance), deviating value → anomaly
    assert out[5].anomaly
    assert out[5].zscore is None  # zero-variance baseline has no zscore
    # after the spike the baseline has variance; 10 is within 3σ
    assert not out[6].anomaly
    assert out[6].zscore is not None and out[6].zscore < 0


def test_anomaly_flags_exact_boundary(spark):
    # trailing [1,2,3]: mean 2, var_samp 1 → 3σ bound = (2±3);
    # x=5 is exactly at the bound → NOT anomalous (strict >), x=6 is.
    df5 = spark.createDataFrame(
        [("k", 0, 1), ("k", 1, 2), ("k", 2, 3), ("k", 3, 5)],
        "k string, t int, v long",
    )
    df6 = spark.createDataFrame(
        [("k", 0, 1), ("k", 1, 2), ("k", 2, 3), ("k", 3, 6)],
        "k string, t int, v long",
    )
    a5 = prof.anomaly_flags(df5, "v", "k", "t", trail=3).filter("t = 3")
    a6 = prof.anomaly_flags(df6, "v", "k", "t", trail=3).filter("t = 3")
    assert not a5.collect()[0].anomaly
    assert a6.collect()[0].anomaly


def test_match_steps_golden(spark):
    df = spark.createDataFrame(
        [
            ("c1", 0, "a"), ("c1", 1, "b"), ("c1", 2, "a"), ("c1", 4, "b"),
            ("c2", 0, "a"), ("c2", 1, "a"),
            ("c3", 0, "b"), ("c3", 1, "a"),  # ends on 'a': no next row
        ],
        "conv_id string, turn_idx int, x string",
    )
    out = sorted(
        (r.conv_id, r.match_start, r.match_end)
        for r in pat.match_steps(df, ["x = 'a'", "x = 'b'"]).collect()
    )
    # c1: (0→1) and (2→4): adjacency is by stream position, not index
    assert out == [("c1", 0, 1), ("c1", 2, 4)]


def test_funnel_golden(spark):
    df = spark.createDataFrame(
        [
            # full funnel
            ("c1", 0, "v"), ("c1", 1, "x"), ("c1", 2, "c"), ("c1", 3, "p"),
            # step 2 happens BEFORE step 1 → not counted; reaches 1
            ("c2", 0, "c"), ("c2", 1, "v"),
            # never does step 1 → absent from output
            ("c3", 0, "c"), ("c3", 1, "p"),
            # same-turn tie: step must be STRICTLY after → reaches 1
            ("c4", 0, "v"), ("c4", 1, "p"),
        ],
        "conv_id string, turn_idx int, x string",
    )
    out = {
        r.conv_id: r
        for r in pat.funnel(
            df, ["x = 'v'", "x = 'c'", "x = 'p'"]
        ).collect()
    }
    assert set(out) == {"c1", "c2", "c4"}
    assert (out["c1"].step_1, out["c1"].step_2, out["c1"].step_3) == (0, 2, 3)
    assert out["c1"].reached == 3
    assert (out["c2"].step_1, out["c2"].step_2) == (1, None)
    assert out["c2"].reached == 1
    assert out["c4"].reached == 1


def test_latency_stats_golden(spark):
    t0 = datetime.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + datetime.timedelta(seconds=sec)

    df = spark.createDataFrame(
        [
            ("c1", 0, "x", ts(0)),
            ("c1", 1, "x", ts(1)),    # delta 1s → x
            ("c1", 2, "y", ts(3)),    # delta 2s → y
            ("c2", 0, "y", ts(0)),    # first turn: excluded
            ("c2", 1, "x", ts(4)),    # delta 4s → x
        ],
        "conv_id string, turn_idx int, tool string, ts timestamp_ntz",
    )
    out = {r.tool: r for r in latency_stats(df, by="tool").collect()}
    assert out["x"].n_spans == 2
    assert (out["x"].min_us, out["x"].max_us) == (1_000_000, 4_000_000)
    assert out["x"].avg_us == 2_500_000.0
    assert out["x"].p50_us == 2_500_000.0
    assert out["y"].n_spans == 1 and out["y"].min_us == 2_000_000


def test_plan_shapes(spark):
    """profile_table is one aggregation pass; anomaly window partitions
    by key (no global single-partition window)."""
    df = spark.createDataFrame([(1, "a")], "i int, s string")
    plan = prof.profile_table(df)._jdf.queryExecution().executedPlan().toString()
    # one scan, one pair of HashAggregates (partial+final), no window
    assert plan.count("Scan ") == 1
    assert "Window" not in plan

    roll = spark.createDataFrame([("k", 1, 5)], "k string, t int, v long")
    aplan = (
        prof.anomaly_flags(roll, "v", "k", "t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the window must be keyed (hashpartitioning on k), never global
    assert "SinglePartition" not in aplan
    assert "hashpartitioning(k" in aplan


def test_match_runs_golden(spark):
    df = spark.createDataFrame(
        [
            ("c1", 0, "e"), ("c1", 1, "e"), ("c1", 2, "x"),
            ("c1", 3, "e"), ("c1", 5, "e"), ("c1", 6, "e"),  # idx gap ok
            ("c2", 0, "e"),                                   # lone: < min
            ("c3", 0, "x"), ("c3", 1, "e"), ("c3", 2, "e"),
        ],
        "conv_id string, turn_idx int, x string",
    )
    out = sorted(
        (r.conv_id, r.run_start, r.run_end, r.run_len)
        for r in pat.match_runs(df, "x = 'e'", min_len=2).collect()
    )
    # runs are maximal and by stream adjacency (turn 3,5,6 is ONE run:
    # turn 4 does not exist, so the rows are consecutive in stream)
    assert out == [
        ("c1", 0, 1, 2),
        ("c1", 3, 6, 3),
        ("c3", 1, 2, 2),
    ]


def test_hll_intersect_sanity(spark):
    from otel2pv_spark.functions import sketch as sk

    # A = 0..599, B = 300..899 → |A∩B| = 300, |A∪B| = 900
    a = spark.range(0, 600).select(
        F.lit("k").alias("g"), F.col("id").cast("string").alias("v")
    )
    b = spark.range(300, 900).select(
        F.lit("k").alias("g"), F.col("id").cast("string").alias("v")
    )
    sa = sk.hll_state(a, ("g",), "v")
    sb = sk.hll_state(b, ("g",), "v")
    r = sk.hll_intersect_estimate(sa, sb, ("g",)).collect()[0]
    # p=8 standard error ~6.5% per estimate; allow a loose band
    assert 400 <= r.n_a <= 800 and 400 <= r.n_b <= 800
    assert 650 <= r.n_union <= 1150
    assert 100 <= r.n_intersect_est <= 500
    # disjoint sets clamp at 0 rather than going negative
    c = spark.range(10_000, 10_600).select(
        F.lit("k").alias("g"), F.col("id").cast("string").alias("v")
    )
    sc = sk.hll_state(c, ("g",), "v")
    r2 = sk.hll_intersect_estimate(sa, sc, ("g",)).collect()[0]
    assert r2.n_intersect_est >= 0


def test_key_skew_golden(spark):
    rows = [("hot", i) for i in range(80)] + [("a", 0), ("b", 0)] * 10
    df = spark.createDataFrame(rows, "k string, v int")
    out = {r.k: r for r in prof.key_skew(df, "k", k=3).collect()}
    assert out["hot"].rank == 1 and out["hot"].n == 80
    assert out["hot"].share_ppm == 800_000
    # ties broken by key asc
    assert (out["a"].rank, out["b"].rank) == (2, 3)
    assert out["a"].share_ppm == 100_000


def test_suggest_checks_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "a", "x1", None),
            (2, "b", "x2", 5.0),
            (3, "a", "x3", 7.0),
        ],
        "id int, cat string, uid string, maybe double",
    )
    out = {
        (r.column, r.kind): r.param
        for r in prof.suggest_checks(prof.profile_table(df)).collect()
    }
    assert ("id", "not_null") in out and ("id", "unique") in out
    assert ("id", "min") in out and out[("id", "min")] == "1.0"
    assert out[("cat", "accepted_values")] == "n=2"
    assert ("cat", "unique") not in out
    assert ("maybe", "not_null") not in out  # has a null
    assert ("maybe", "unique") in out        # 2 distinct over 2 non-null
    assert ("uid", "unique") in out
