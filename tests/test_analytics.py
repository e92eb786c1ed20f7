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


def test_order_priority_semi_join_shape_and_multiplicity(spark, sf_dir):
    """Q4 shape: the EXISTS is a LeftSemi join (no dedup, no Expand);
    an order with several qualifying return lines counts ONCE."""
    t = analytics.load_tpch(spark, sf_dir, "orders", "lineitem")
    df = analytics.order_priority_counts(t["orders"], t["lineitem"])
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "Expand" not in plan  # no dedup rewrite sneaking in

    ords = spark.createDataFrame(
        [(1, "1996-02-01", "1-URGENT"), (2, "1996-02-01", "5-LOW"),
         (3, "1995-06-01", "5-LOW")],  # outside the window
        "o_orderkey long, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    li = _lineitem(
        spark,
        [(1, 1, 1.0, 1.0, 0.0, 0.0, "R", "O", "1996-03-01"),
         (1, 1, 1.0, 1.0, 0.0, 0.0, "R", "O", "1996-04-01"),  # 2nd match
         (2, 1, 1.0, 1.0, 0.0, 0.0, "R", "O", "1996-01-15"),  # shipped BEFORE
         (2, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-03-01")],  # not returned
    )
    got = {r.o_orderpriority: r.order_count
           for r in analytics.order_priority_counts(ords, li).collect()}
    assert got == {"1-URGENT": 1}  # order 1 once despite two matches


def test_customer_order_distribution_zero_bucket(spark, sf_dir):
    """Q13 shape: LEFT OUTER keeps orderless customers in the 0 bucket."""
    t = analytics.load_tpch(spark, sf_dir, "customer", "orders")
    df = analytics.customer_order_distribution(t["customer"], t["orders"])
    plan = _plan(df)
    assert "LeftOuter" in plan

    cust = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey long")
    ords = spark.createDataFrame(
        [(10, 1, "1995-05-01"), (11, 1, "1995-06-01"),
         (12, 2, "1999-01-01")],  # past the cutoff -> cust 2 has 0
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    got = {r.c_count: r.custdist
           for r in analytics.customer_order_distribution(cust, ords).collect()}
    assert got == {0: 2, 2: 1}


def test_parts_supplier_counts_anti_join_and_distinct(spark, sf_dir):
    """Q16 shape: NOT IN is a LeftAnti join; count(DISTINCT) dedups a
    supplier shipping the same part many times."""
    # NB: at sf0.001 the complaints side is EMPTY and AQE's
    # empty-relation propagation elides the anti join entirely (the
    # correct plan!), so the LeftAnti assertion runs on the non-empty
    # fixture below instead.
    part = spark.createDataFrame(
        [(1, "Brand#22", "TYPE", 5)],
        "p_partkey long, p_brand string, p_type string, p_size int",
    )
    sup = spark.createDataFrame(
        [(100, 10.0), (200, -5.0)], "s_suppkey long, s_acctbal double"
    )
    li = spark.createDataFrame(
        [(1, 100), (1, 100), (1, 200)],  # supp 100 twice, 200 complained
        "l_partkey long, l_suppkey long",
    )
    df = analytics.parts_supplier_counts(part, sup, li)
    got = df.collect()
    assert len(got) == 1 and got[0].supplier_cnt == 1
    assert "LeftAnti" in _plan(df)


def test_large_volume_customers_single_fact_scan_and_threshold(spark, sf_dir):
    """Q18 shape: ONE lineitem scan; the HAVING filter is exact at the
    boundary (sum == threshold excluded, just above included)."""
    t = analytics.load_tpch(spark, sf_dir, "customer", "orders", "lineitem")
    df = analytics.large_volume_customers(t["customer"], t["orders"], t["lineitem"])
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 1
    assert "Window" not in plan

    cust = spark.createDataFrame([(7,)], "c_custkey long")
    ords = spark.createDataFrame(
        [(1, 7, "1996-01-01", 10.0), (2, 7, "1996-01-01", 20.0)],
        "o_orderkey long, o_custkey long, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    li = _lineitem(
        spark,
        [(1, 1, 250.0, 1.0, 0.0, 0.0, "N", "O", "1996-02-01"),   # == threshold
         (2, 1, 250.5, 1.0, 0.0, 0.0, "N", "O", "1996-02-01")],  # just above
    )
    got = analytics.large_volume_customers(cust, ords, li).collect()
    assert [r.o_orderkey for r in got] == [2]
    assert got[0].sum_qty_micro == 250_500_000


def test_idle_high_balance_exact_average_cut(spark, sf_dir):
    """Q22 shape: LeftAnti for NOT EXISTS; the average cut is an exact
    integer cross-multiplication — a customer exactly AT the average is
    excluded (strict >), which floating-point division could flip."""
    t = analytics.load_tpch(spark, sf_dir, "customer", "orders")
    df = analytics.idle_high_balance_customers(t["customer"], t["orders"])
    plan = _plan(df)
    assert "LeftAnti" in plan

    cust = spark.createDataFrame(
        [(1, "A", 100.0), (2, "A", 200.0), (3, "B", 300.0), (4, "B", 200.0)],
        "c_custkey long, c_mktsegment string, c_acctbal double",
    )  # avg = 200.0: custs 2 and 4 sit exactly at it -> excluded
    ords = spark.createDataFrame(
        [(1, 3, "2000-09-01")],  # cust 3 ordered recently -> anti-joined out
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    got = analytics.idle_high_balance_customers(cust, ords).collect()
    assert got == []  # 3 was the only above-average customer

    ords_none = ords.filter(F.lit(False))
    got2 = {(r.c_mktsegment): (r.numcust, r.totacctbal_micro)
            for r in analytics.idle_high_balance_customers(cust, ords_none).collect()}
    assert got2 == {"B": (1, 300_000_000)}


def test_waiting_suppliers_one_fact_scan_and_semantics(spark, sf_dir):
    """Q21 shape: the double EXISTS collapses to one grouped pass —
    the fact is scanned ONCE (the decorrelated self-join form scans it
    three times); per-order golden semantics."""
    t = analytics.load_tpch(spark, sf_dir, "lineitem", "supplier")
    df = analytics.waiting_suppliers(t["lineitem"], t["supplier"])
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 1

    li = _lineitem(
        spark,
        # order 1: supp 10 returned, supp 20 didn't -> 10 qualifies
        [(1, 10, 1.0, 1.0, 0.0, 0.0, "R", "O", "1996-01-01"),
         (1, 10, 1.0, 1.0, 0.0, 0.0, "R", "O", "1996-01-02"),  # 2nd R line, same order
         (1, 20, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01"),
         # order 2: single-supplier order -> no one kept anyone waiting
         (2, 10, 1.0, 1.0, 0.0, 0.0, "R", "O", "1996-01-01"),
         # order 3: BOTH suppliers returned -> neither qualifies
         (3, 10, 1.0, 1.0, 0.0, 0.0, "R", "O", "1996-01-01"),
         (3, 20, 1.0, 1.0, 0.0, 0.0, "R", "O", "1996-01-01")],
    )
    sup = spark.createDataFrame(
        [(10, "sa"), (20, "sb")], "s_suppkey long, s_name string"
    )
    got = {r.s_name: r.numwait
           for r in analytics.waiting_suppliers(li, sup).collect()}
    assert got == {"sa": 1}  # order 1 once, despite two R lines
