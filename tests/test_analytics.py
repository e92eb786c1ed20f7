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


# ---------------------------------------------------------------------------
# The twelve shapes completing the 22-pattern set
# ---------------------------------------------------------------------------


def test_forecast_revenue_scan_only_and_integer_golden(spark, sf_dir):
    """Q6 shape: zero joins, one exchange; revenue = price x discount
    in exact micros."""
    t = analytics.load_tpch(spark, sf_dir, "lineitem")
    df = analytics.forecast_revenue(t["lineitem"])
    plan = _plan(df)
    assert "Join" not in plan
    assert plan.count("Exchange") == 1

    li = _lineitem(
        spark,
        [(1, 1, 10.0, 100.0, 0.05, 0.0, "N", "O", "1997-06-01"),   # in band
         (2, 1, 30.0, 100.0, 0.05, 0.0, "N", "O", "1997-06-01"),   # qty too big
         (3, 1, 10.0, 100.0, 0.08, 0.0, "N", "O", "1997-06-01"),   # disc out
         (4, 1, 10.0, 100.0, 0.05, 0.0, "N", "O", "1996-06-01")],  # year out
    )
    got = analytics.forecast_revenue(li).collect()[0]
    assert got.revenue_micro == 5_000_000  # 100 * 0.05
    assert got.n_lines == 1


def test_min_cost_suppliers_tie_and_reuse(spark, sf_dir):
    """Q2 shape: per-part MIN joined back on its own key — ties keep
    every matching supplier; the aggregate's exchange is REUSED (the
    fact feeds both branches through one scan)."""
    t = analytics.load_tpch(
        spark, sf_dir, "part", "supplier", "lineitem", "nation", "region"
    )
    df = analytics.min_cost_suppliers(t)
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 1  # branches share the scan
    assert "ReusedExchange" in plan

    part = spark.createDataFrame(
        [(1, "big bolt", 45)], "p_partkey long, p_name string, p_size int"
    )
    sup = spark.createDataFrame(
        [(10, "sa", 5.0, 0), (20, "sb", 6.0, 0), (30, "sc", 7.0, 0)],
        "s_suppkey long, s_name string, s_acctbal double, s_nationkey int",
    )
    nat = spark.createDataFrame([(0, "N0", 0)],
                                "n_nationkey int, n_name string, n_regionkey int")
    reg = spark.createDataFrame([(0, "ASIA")], "r_regionkey int, r_name string")
    li = spark.createDataFrame(
        # unit costs: supp10 -> 2.0, supp20 -> 2.0 (tie), supp30 -> 3.0
        [(1, 10, 5.0, 10.0), (1, 20, 2.0, 4.0), (1, 30, 1.0, 3.0)],
        "l_partkey long, l_suppkey long, l_quantity double, l_extendedprice double",
    )
    got = analytics.min_cost_suppliers(
        {"part": part, "supplier": sup, "lineitem": li, "nation": nat,
         "region": reg}
    ).collect()
    assert sorted(r.s_suppkey for r in got) == [10, 20]
    assert all(r.supp_cost_micro == 2_000_000 for r in got)


def test_volume_shipping_pair_filter_golden(spark):
    """Q7 shape: both directions kept, same-nation and third-nation
    flows dropped, grouped per year."""
    nat = spark.createDataFrame(
        [(1, "NATION_1"), (2, "NATION_2"), (3, "NATION_3")],
        "n_nationkey int, n_name string",
    )
    sup = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "s_suppkey long, s_nationkey int"
    )
    cust = spark.createDataFrame(
        [(100, 1), (200, 2), (300, 3)], "c_custkey long, c_nationkey int"
    )
    ords = spark.createDataFrame(
        [(1000, 200), (2000, 100), (3000, 300), (4000, 100)],
        "o_orderkey long, o_custkey long",
    )
    li = _lineitem(
        spark,
        # supp1 -> cust2 (kept), supp2 -> cust1 (kept, other direction),
        # supp3 -> cust3 (dropped), supp1 -> cust1 (same nation, dropped)
        [(1000, 10, 1.0, 100.0, 0.0, 0.0, "N", "O", "1996-06-01"),
         (2000, 20, 1.0, 50.0, 0.0, 0.0, "N", "O", "1997-06-01"),
         (3000, 30, 1.0, 70.0, 0.0, 0.0, "N", "O", "1996-06-01"),
         (4000, 10, 1.0, 30.0, 0.0, 0.0, "N", "O", "1996-06-01")],
    )
    got = {
        (r.supp_nation, r.cust_nation, r.l_year): r.revenue_micro
        for r in analytics.volume_shipping(
            {"nation": nat, "supplier": sup, "customer": cust,
             "orders": ords, "lineitem": li}
        ).collect()
    }
    assert got == {
        ("NATION_1", "NATION_2", 1996): 100_000_000,
        ("NATION_2", "NATION_1", 1997): 50_000_000,
    }


def test_market_share_num_den_and_one_scan(spark, sf_dir):
    """Q8 shape: numerator <= denominator per year, exact pair; one
    fact scan."""
    t = analytics.load_tpch(
        spark, sf_dir,
        "lineitem", "orders", "customer", "supplier", "part", "nation",
        "region",
    )
    df = analytics.market_share(t)
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 1
    got = df.collect()
    assert len(got) >= 1
    assert all(0 <= r.target_volume_micro <= r.total_volume_micro for r in got)


def test_product_profit_integer_golden(spark):
    """Q9 shape: profit = disc_price - retail x qty, exact (and
    possibly negative) BIGINT micros."""
    part = spark.createDataFrame(
        [(1, "red widget", 3.0)],
        "p_partkey long, p_name string, p_retailprice double",
    )
    sup = spark.createDataFrame([(10, 0)], "s_suppkey long, s_nationkey int")
    nat = spark.createDataFrame([(0, "N0")], "n_nationkey int, n_name string")
    ords = spark.createDataFrame(
        [(1, "1997-03-01")], "o_orderkey long, o_orderdate string"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    li = _lineitem(
        spark,
        [(1, 10, 2.0, 10.0, 0.1, 0.0, "N", "O", "1997-03-05")],
    ).withColumn("l_partkey", F.lit(1).cast("long"))
    got = analytics.product_profit(
        {"part": part, "supplier": sup, "nation": nat, "orders": ords,
         "lineitem": li}
    ).collect()
    # dp = 10 * 0.9 = 9.0 ; cost = 3.0 * 2 = 6.0 ; profit 3.0
    assert got[0].nation == "N0" and got[0].o_year == 1997
    assert got[0].profit_micro == 3_000_000


def test_returned_customers_rank_and_dims_after_cut(spark, sf_dir):
    """Q10 shape: contiguous ranks, k bound respected, customer dim
    joined AFTER the top-k (the join input is k rows — asserted by the
    output arity staying k even though every customer exists)."""
    t = analytics.load_tpch(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    got = analytics.returned_item_customers(t).collect()
    assert 1 <= len(got) <= 20
    assert sorted(r.rank for r in got) == list(range(1, len(got) + 1))
    assert all(r.c_name is not None and r.n_name is not None for r in got)


def test_important_parts_strict_fraction_boundary(spark):
    """Q11 shape: strict > on the cross-multiplied fraction — a part
    exactly AT the threshold is excluded."""
    sup = spark.createDataFrame([(10, 5)], "s_suppkey long, s_nationkey int")
    nat = spark.createDataFrame(
        [(5, "NATION_5")], "n_nationkey int, n_name string"
    )
    # values: part 1 -> 999 units, part 2 -> 1 unit of a 1000-unit total
    # at fraction_ppm=1000 (0.1%): threshold = 1 unit; strict > excludes
    # part 2 exactly at it.
    li = _lineitem(
        spark,
        [(1, 10, 1.0, 999.0, 0.0, 0.0, "N", "O", "1997-01-01"),
         (2, 10, 1.0, 1.0, 0.0, 0.0, "N", "O", "1997-01-01")],
    ).withColumn(
        "l_partkey", F.when(F.col("l_orderkey") == 1, 1).otherwise(2).cast("long")
    )
    got = analytics.important_parts(
        {"lineitem": li, "supplier": sup, "nation": nat}
    ).collect()
    assert [r.l_partkey for r in got] == [1]


def test_late_priority_residual_and_split_counts(spark):
    """Q12 shape: the lateness compare is a join residual; the two
    counts split one aggregate."""
    ords = spark.createDataFrame(
        [(1, "1997-01-01", "1-URGENT"), (2, "1997-01-01", "5-LOW")],
        "o_orderkey long, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    li = _lineitem(
        spark,
        [(1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1997-06-01"),   # late, critical
         (2, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1997-06-01"),   # late, low
         (1, 1, 1.0, 1.0, 0.0, 0.0, "N", "F", "1997-01-15")],  # on time -> out
    )
    got = {r.l_linestatus: (r.high_line_count, r.low_line_count)
           for r in analytics.late_shipment_priority(ords, li).collect()}
    assert got == {"O": (1, 1)}


def test_promo_share_num_subset_of_den(spark, sf_dir):
    """Q14 shape: per-month exact (numerator, denominator) pair."""
    t = analytics.load_tpch(spark, sf_dir, "part", "lineitem")
    got = analytics.promo_revenue_share(t["part"], t["lineitem"]).collect()
    assert len(got) == 12  # every 1997 month ships something
    assert all(0 <= r.promo_revenue_micro <= r.total_revenue_micro for r in got)


def test_small_qty_revenue_cross_mult_boundary(spark):
    """Q17 shape: qty exactly at num/den x avg is excluded (strict <)."""
    part = spark.createDataFrame(
        [(1, "Brand#3")], "p_partkey long, p_brand string"
    )
    # avg qty = 25 -> cut at 5: the qty-5 line sits AT the boundary and
    # must be excluded; the qty-4 line is in.
    li = _lineitem(
        spark,
        [(1, 1, 66.0, 1.0, 0.0, 0.0, "N", "O", "1997-01-01"),
         (2, 1, 25.0, 1.0, 0.0, 0.0, "N", "O", "1997-01-01"),
         (3, 1, 5.0, 2.0, 0.0, 0.0, "N", "O", "1997-01-01"),
         (4, 1, 4.0, 8.0, 0.0, 0.0, "N", "O", "1997-01-01")],
    ).withColumn("l_partkey", F.lit(1).cast("long"))
    got = analytics.small_quantity_revenue(part, li).collect()[0]
    assert got.n_lines == 1
    assert got.revenue_micro == 8_000_000


def test_banded_revenue_one_pass_no_union(spark, sf_dir):
    """Q19 shape: the OR-of-ANDs runs as ONE join pass — no Union, one
    fact scan; per-band conditional sums reconcile with the total."""
    t = analytics.load_tpch(spark, sf_dir, "part", "lineitem")
    df = analytics.banded_revenue(t["part"], t["lineitem"])
    plan = _plan(df)
    assert "Union" not in plan
    assert plan.count("lineitem.parquet") == 1
    r = df.collect()[0]
    # bands can overlap in principle; with these bands they don't:
    assert (r.band0_revenue_micro + r.band1_revenue_micro
            + r.band2_revenue_micro) == r.revenue_micro
    assert r.n_lines > 0  # non-vacuous at sf0.001


def test_dominant_suppliers_share_cut_golden(spark):
    """Q20 shape: supplier above the 2/3 share wins; the others and
    ties at exactly 2/3 lose (strict >)."""
    part = spark.createDataFrame([(1, "red bolt")], "p_partkey long, p_name string")
    sup = spark.createDataFrame(
        [(10, "sa", 0), (20, "sb", 0)],
        "s_suppkey long, s_name string, s_nationkey int",
    )
    nat = spark.createDataFrame([(0, "N0")], "n_nationkey int, n_name string")
    li = _lineitem(
        spark,
        [(1, 10, 9.0, 1.0, 0.0, 0.0, "N", "O", "1997-01-01"),
         (2, 20, 3.0, 1.0, 0.0, 0.0, "N", "O", "1997-01-01")],
    ).withColumn("l_partkey", F.lit(1).cast("long"))
    got = analytics.dominant_part_suppliers(
        {"part": part, "supplier": sup, "lineitem": li, "nation": nat}
    ).collect()
    assert [r.s_suppkey for r in got] == [10]  # 9/12 > 2/3; 3/12 is not
