"""Analytical query shapes (plans/analytics.py): exact integer money
math goldens + physical-plan shape regressions (the plan IS the point
of these queries — see the module docstring)."""

from __future__ import annotations

import pyspark.sql.functions as F

from otel2pv_spark.plans import analytics


def _plan(df) -> str:
    """Final physical plan AFTER execution: the module leaves the
    SF-scaled joins to AQE, so the join strategy only exists in the
    post-execution adaptive plan (the initial plan shows the
    pre-adaptive placeholder)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the adaptive plan string repeats every node under an
    # "== Initial Plan ==" section — count nodes in the final plan only
    return plan.split("== Initial Plan ==")[0]


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))


def test_pricing_summary_integer_math_golden(spark):
    """disc_price / charge derivation in exact micro-units: 100.00 at
    5% discount and 8% tax -> 95.00 disc price, 102.60 charge, with the
    DIV-by-1e6 staging (floor at each step, not at the end)."""
    li = _lineitem(
        spark,
        [(1, 1, 2.0, 100.0, 0.05, 0.08, "N", "O", "1997-01-01"),
         (2, 1, 3.0, 10.0, 0.0, 0.0, "N", "O", "1997-01-01"),
         (3, 1, 1.0, 10.0, 0.0, 0.0, "R", "F", "1999-01-01")],  # past cutoff
    )
    rows = {
        (r.l_returnflag, r.l_linestatus): r
        for r in analytics.pricing_summary(li, cutoff="1998-09-02").collect()
    }
    assert set(rows) == {("N", "O")}
    r = rows[("N", "O")]
    assert r.sum_qty_micro == 5_000_000
    assert r.sum_base_price_micro == 110_000_000
    # 100 * 0.95 = 95 -> 95_000_000 ; plus undiscounted 10_000_000
    assert r.sum_disc_price_micro == 105_000_000
    # 95 * 1.08 = 102.6 -> 102_600_000 ; plus 10_000_000
    assert r.sum_charge_micro == 112_600_000
    assert r.count_order == 2


def test_pricing_summary_plan_no_join_one_exchange(spark, sf_dir):
    t = analytics.load_tpch(spark, sf_dir, "lineitem")
    plan = _plan(analytics.pricing_summary(t["lineitem"]))
    assert "Join" not in plan
    assert plan.count("Exchange") == 1  # partial -> final agg only


def test_shipping_priority_plan_broadcast_only(spark, sf_dir):
    t = analytics.load_tpch(spark, sf_dir, "customer", "orders", "lineitem")
    df = analytics.shipping_priority(t["customer"], t["orders"], t["lineitem"])
    plan = _plan(df)
    # unhinted joins: at test SF, AQE measures the filtered sides small
    # and picks broadcast at runtime (the large-SF fallback is a
    # shuffle join — the point is no FORCED broadcast of scaled sides)
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    # sanity: deterministic ranked output, ranks 1..k contiguous
    ranks = [r.rank for r in df.collect()]
    assert ranks == list(range(1, len(ranks) + 1))


def test_revenue_by_nation_plan_single_fact_scan(spark, sf_dir):
    t = analytics.load_tpch(
        spark, sf_dir,
        "lineitem", "orders", "customer", "supplier", "nation", "region",
    )
    df = analytics.revenue_by_nation(t)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4
    # the fact table is scanned exactly once
    assert plan.count("lineitem.parquet") == 1
    # non-vacuous (the c_nation == s_nation cut is sparse at sf0.001)
    assert 1 <= df.count() <= 5


def test_top_suppliers_plan_no_window_and_tie_semantics(spark, sf_dir):
    t = analytics.load_tpch(spark, sf_dir, "lineitem", "supplier")
    df = analytics.top_suppliers(t["lineitem"], t["supplier"])
    plan = _plan(df)
    assert "Window" not in plan
    got = df.collect()
    assert len(got) >= 1
    assert len({r.total_revenue_micro for r in got}) == 1  # all tied at max

    # explicit tie golden: two suppliers with identical revenue
    li = _lineitem(
        spark,
        [(1, 10, 1.0, 50.0, 0.0, 0.0, "N", "O", "1996-02-01"),
         (2, 20, 1.0, 50.0, 0.0, 0.0, "N", "O", "1996-02-01"),
         (3, 30, 1.0, 10.0, 0.0, 0.0, "N", "O", "1996-02-01")],
    )
    sup = spark.createDataFrame(
        [(10, "sa"), (20, "sb"), (30, "sc")], "s_suppkey long, s_name string"
    )
    winners = sorted(
        r.s_suppkey for r in analytics.top_suppliers(li, sup).collect()
    )
    assert winners == [10, 20]
