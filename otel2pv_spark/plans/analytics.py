"""Analytical query shapes over the relational side tables.

The driver's testdata ships TPC-H-ish tables (lineitem / orders /
customer / supplier / nation / region / part) alongside the transcript
carrier; together these queries cover ALL 22 classic TPC-H plan
patterns (Q1-Q22, adapted where the fixture lacks partsupp/shipmode —
stand-ins documented per query). Each is a distinct physical pattern
the engine must get right at 100 TB, and each is written so Catalyst
produces exactly that pattern (asserted in tests/test_analytics.py).
The first four, annotated:

1. ``pricing_summary`` — the full-scan aggregate: one map-side-combined
   hash aggregate over the fact table, zero joins, grouping cardinality
   O(flags x statuses). The only exchange carries pre-aggregated rows.
2. ``shipping_priority`` — selective dim -> fact: filters prune the
   customer segment and date ranges BEFORE any join, one aggregate on
   the fact's own join key, global top-k via the shared two-level
   pattern (never a full sort). The custkey/orderkey joins carry no
   broadcast hint: customer and orders scale WITH the fact, so the
   join strategy is AQE's runtime call — broadcast when the filtered
   side measures small (it does at test SF; asserted post-execution),
   shuffle hash/merge when it does not. Forcing broadcast here would
   OOM the driver at large SF.
3. ``revenue_by_nation`` — the star join: region -> nation is
   CONSTANT-sized (25/5 rows at every TPC-H SF) and explicitly
   broadcast; the supplier/customer/orders sides scale with SF and are
   left to AQE like (2). The whole star still resolves with ONE fact
   scan, and the Q5 twist (customer and supplier must share a nation)
   lands as a codegen filter.
4. ``top_suppliers`` — aggregate-then-argmax: per-supplier revenue,
   global max as a one-row broadcast joined back (no window over the
   whole aggregate, no second scan of the fact).

All money math is row-locally quantized to BIGINT micro-units before
any cross-row sum (the repo-wide exactness doctrine: integer sums are
associative, so results are identical across engines, partitionings
and parallelism levels — a raw DOUBLE sum is none of those). Derived
terms stay in integers end-to-end:

    disc_price = price * (1 - disc)  ->  p_mi * (1e6 - d_mi) DIV 1e6
    charge     = disc_price * (1+tax) -> dp_mi * (1e6 + t_mi) DIV 1e6

Peak per-row intermediate ~ 1e17 (price 1e5 -> 1e11 micro, x 1e6),
inside BIGINT with room to spare. Overflow bound on the CROSS-ROW
sums (same honesty rule as profile.anomaly_flags): pricing_summary's
per-group charge sum reaches 2^63 at ~2e8 rows/group x ~4e10 micro,
i.e. around TPC-H SF ~1.5e2 per (returnflag, linestatus) cell — past
that, widen the accumulator (`F.sum(expr.cast("decimal(38,0)"))`,
~10^18 x more headroom) or drop quantization to cents; the per-row
derivation is unaffected either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.topk import two_level_topk

from ..operators.aggregate import _value_micro as _mi  # shared quantizer

MICRO = 1_000_000


def load_tpch(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in tables}


_DISC_PRICE_SQL = (
    f"(CAST(round(l_extendedprice * 1e6) AS BIGINT)"
    f" * ({MICRO} - CAST(round(l_discount * 1e6) AS BIGINT))) DIV {MICRO}"
)


def _disc_price_mi():
    return F.expr(_DISC_PRICE_SQL).cast("bigint")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """Q1 shape: one pass, one map-side-combined aggregate. Averages are
    emitted as (sum, count) pairs — exact, mergeable, and the caller can
    divide at display time."""
    dp = _disc_price_mi()
    charge = F.expr(
        f"(({_DISC_PRICE_SQL}) * "
        f"({MICRO} + CAST(round(l_tax * 1e6) AS BIGINT))) DIV {MICRO}"
    ).cast("bigint")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_mi("l_quantity")).alias("sum_qty_micro"),
            F.sum(_mi("l_extendedprice")).alias("sum_base_price_micro"),
            F.sum(dp).alias("sum_disc_price_micro"),
            F.sum(charge).alias("sum_charge_micro"),
            F.sum(_mi("l_discount")).alias("sum_discount_micro"),
            F.count("*").alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-03-15",
    k: int = 10,
) -> DataFrame:
    """Q3 shape: filters pushed below the joins, revenue aggregated on
    the fact's own join key, top-k two-level — partial per partition,
    final over <= k x P rows. Join strategy is deliberately UNHINTED:
    customer and orders scale with the fact table, so a forced
    broadcast would OOM at large SF — AQE broadcasts the filtered
    sides when their runtime size is small and falls back to a
    shuffle join when not (see module docstring)."""
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = (
        orders.filter(F.col("o_orderdate") < F.lit(date).cast("timestamp"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    rev = (
        lineitem.filter(F.col("l_shipdate") > F.lit(date).cast("timestamp"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price_mi()).alias("revenue_micro"))
    )
    return two_level_topk(
        rev,
        group_cols=[],
        order_cols=[F.col("revenue_micro").desc(), F.col("l_orderkey").asc()],
        k=k,
    ).select(
        "l_orderkey", "revenue_micro",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
        "o_orderpriority", "rank",
    )


def revenue_by_nation(
    tables: dict[str, DataFrame],
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """Q5 shape: region->nation restricts to a CONSTANT handful of
    keys (25/5 rows at every SF — the only sides safe to force), those
    broadcast onto supplier and customer; the supplier/customer/orders
    joins scale with SF and are left unhinted for AQE (broadcast at
    small runtime sizes, shuffle at large — never a driver collect of
    a fact-scaled side). The star still resolves with ONE fact-table
    scan; the Q5 identity (customer nation == supplier nation) lands
    as a codegen equality filter."""
    nat = (
        tables["nation"]
        .join(
            F.broadcast(
                tables["region"].filter(F.col("r_name") == region_name)
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = tables["supplier"].join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust = tables["customer"].join(
        F.broadcast(nat.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_nationkey")
    ords = (
        tables["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
    )
    return (
        tables["lineitem"]
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_disc_price_mi()).alias("revenue_micro"))
    )


def top_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """Q15 shape: per-supplier quarter revenue, then the argmax WITHOUT
    a global window or a second fact scan — the ONE-ROW max aggregate
    (the only side truly constant at every SF) broadcasts back onto
    the per-supplier aggregate and
    an equality filter keeps the winners (plural on ties, same as the
    reference query's subquery form)."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_disc_price_mi()).alias("total_revenue_micro"))
    )
    mx = rev.agg(F.max("total_revenue_micro").alias("_max_rev"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue_micro") == F.col("_max_rev"))
        .join(supplier.select("s_suppkey", "s_name"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_micro")
    )


def order_priority_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """Q4 shape — the EXISTS decorrelated as a LEFT SEMI join.

    Orders in the quarter with at least one returned line shipped after
    the order date, counted per priority. The one plan shape that
    matters: the EXISTS must become a LeftSemi join on the equi-key
    (orderkey) with the ship>order comparison as the join residual —
    NEVER `lineitem.dropDuplicates(orderkey).join(...)` (a second
    fact-sized shuffle + state to dedup what the semi join discards for
    free) and never an inner join + dedup after (row explosion first,
    cleanup later). Both join sides scale with SF, so the strategy is
    left to AQE (asserted post-execution in tests)."""
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    returned = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        ords.join(
            returned,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def customer_order_distribution(
    customer: DataFrame,
    orders: DataFrame,
    date_to: str = "1996-01-01",
) -> DataFrame:
    """Q13 shape — LEFT OUTER join + double aggregation.

    How many customers placed 0, 1, 2, ... early orders: the outer join
    keeps orderless customers (count(o_orderkey) counts only non-null
    matches, so they land in the 0 bucket — the null path is the
    point), the first aggregate runs on the join's own key (no extra
    exchange beyond the join's), and the second aggregate's input is
    one row per customer collapsed to one row per distinct count —
    tiny. Both sides scale with SF: unhinted, AQE decides."""
    ords = orders.filter(
        F.col("o_orderdate") < F.lit(date_to).cast("timestamp")
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        customer.select("c_custkey")
        .join(ords, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def parts_supplier_counts(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    excl_brand: str = "Brand#11",
    sizes: tuple[int, ...] = (1, 5, 9, 13, 17, 21, 25, 29),
) -> DataFrame:
    """Q16 shape — NOT IN decorrelated as a LEFT ANTI join + distinct
    aggregate.

    Distinct suppliers able to supply each qualifying (brand, type,
    size), excluding complaint suppliers (negative balance — the
    fixture's analog of Q16's comment LIKE '%Complaints%'). Plan
    points: the part predicates prune BEFORE the fact join (pushed
    scan filters), the NOT IN is a LeftAnti join on suppkey (null-safe
    by construction: keys are non-null here, and an anti join is the
    only NOT-IN rewrite that neither collects the exclusion list to
    the driver nor double-scans), and count(DISTINCT) runs two-phase
    (partial distinct per partition, merge after) — Catalyst's
    expand-based rewrite, no row ever carries a set."""
    parts = part.filter(
        (F.col("p_brand") != excl_brand) & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    complaints = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(complaints, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
) -> DataFrame:
    """Q18 shape — HAVING-subquery as aggregate-then-join-back.

    Orders whose total quantity exceeds the threshold, with their
    customer. The IN (SELECT ... HAVING) decorrelates to: ONE pass over
    the fact building the per-order quantity sum, the HAVING as a
    plain filter on that aggregate (runs on the aggregate's own
    exchange — selective, drops ~99% of orders before any join), then
    joins back to orders/customer. The fact is scanned ONCE; the
    classic trap — joining lineitem to orders first and aggregating
    the widened rows — shuffles order columns through the fact-sized
    exchange for nothing. Threshold compare in exact micro-units."""
    min_qty_micro = int(round(min_qty * MICRO))
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_mi("l_quantity")).alias("sum_qty_micro"))
        .filter(F.col("sum_qty_micro") > min_qty_micro)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            _mi("o_totalprice").alias("o_totalprice_micro"),
            "sum_qty_micro",
        )
    )


def waiting_suppliers(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """Q21 shape — double correlation (EXISTS + NOT EXISTS on the same
    fact) collapsed to ONE grouped pass.

    "Suppliers who alone returned lines on multi-supplier orders": the
    textbook decorrelation is two fact-sized self-joins on orderkey
    (semi for the EXISTS, anti for the NOT EXISTS — three scans of the
    fact). Because BOTH correlated subqueries share the outer query's
    key, the whole predicate is a function of per-order aggregates:

        qualifies(order)  = distinct suppliers >= 2
                            AND distinct RETURNED suppliers == 1
        winner(order)     = that sole returned supplier

    — one scan, one map-side-combined groupBy(orderkey), then a count
    per winner. This is the rewrite Catalyst cannot derive from the
    EXISTS form (it would need to prove the two subqueries' key
    equality); writing it set-first is the engine's job. The oracle
    deliberately keeps the EXISTS/NOT-EXISTS form — a different
    algorithm validating the rewrite. numwait counts distinct
    qualifying ORDERS per supplier (each order qualifies once however
    many returned lines it has)."""
    ret_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("_n_supp"),
            F.countDistinct(ret_supp).alias("_n_ret"),
            F.min(ret_supp).alias("_ret_supp"),
        )
        .filter((F.col("_n_supp") >= 2) & (F.col("_n_ret") == 1))
    )
    return (
        per_order.groupBy("_ret_supp")
        .agg(F.count("*").alias("numwait"))
        .join(
            supplier.select("s_suppkey", "s_name"),
            F.col("_ret_supp") == F.col("s_suppkey"),
        )
        .select("s_name", "numwait")
    )


def idle_high_balance_customers(
    customer: DataFrame,
    orders: DataFrame,
    since: str = "2000-08-01",
) -> DataFrame:
    """Q22 shape — scalar subquery as a one-row broadcast + LEFT ANTI.

    Per segment: customers above the global average balance with no
    recent orders. The scalar AVG is the only side constant at every
    SF — a one-row (sum, count) aggregate broadcast back, compared by
    integer cross-multiplication (bal_micro * n > total_micro) so the
    cut is exact under any partitioning, where a floating average
    would make the boundary row engine-dependent. The NOT EXISTS is a
    LeftAnti against the filtered orders (scales with SF — unhinted).
    Peak product ~1e11 micro x 1e10 customers — inside BIGINT."""
    bal = customer.select(
        "c_custkey", "c_mktsegment", _mi("c_acctbal").alias("bal_micro")
    )
    tot = bal.agg(
        F.sum("bal_micro").alias("_tot_micro"), F.count("*").alias("_n")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp")
    ).select("o_custkey")
    return (
        bal.join(F.broadcast(tot))
        .filter(F.col("bal_micro") * F.col("_n") > F.col("_tot_micro"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal_micro").alias("totacctbal_micro"),
        )
    )


# ---------------------------------------------------------------------------
# The remaining classic shapes — with these twelve, every one of the 22
# TPC-H plan patterns (adapted to the fixture's schema: no partsupp, no
# shipmode/commitdate — stand-ins documented per query) has a Spark-first,
# integer-exact implementation whose physical plan is asserted in
# tests/test_analytics.py.
# ---------------------------------------------------------------------------


def forecast_revenue(
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    disc_lo: float = 0.04,
    disc_hi: float = 0.06,
    max_qty: float = 24.0,
) -> DataFrame:
    """Q6 shape — the pure scan-and-aggregate: range predicates on three
    columns, zero joins, ONE row out. The entire query must collapse to
    a column-pruned parquet scan (date/discount/quantity/price only)
    with the filters pushed into the reader and a single map-side
    partial sum — the exchange carries one row per task. revenue =
    price x discount, both micro-quantized row-locally, product
    rescaled by DIV 1e6 (exact under any partitioning)."""
    rev = F.expr(
        f"(CAST(round(l_extendedprice * 1e6) AS BIGINT)"
        f" * CAST(round(l_discount * 1e6) AS BIGINT)) DIV {MICRO}"
    ).cast("bigint")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(F.sum(rev).alias("revenue_micro"), F.count("*").alias("n_lines"))
    )


_UNIT_COST_SQL = (
    "CAST(round(l_extendedprice * 1e6) AS BIGINT)"
    " DIV CAST(round(l_quantity) AS BIGINT)"
)


def min_cost_suppliers(
    tables: dict[str, DataFrame],
    region_name: str = "ASIA",
    min_size: int = 40,
) -> DataFrame:
    """Q2 shape — the correlated MIN subquery decorrelated as a
    per-group aggregate joined back on its own key.

    For each large part, the region's suppliers who match the MINIMUM
    observed unit cost of that part (fixture stand-in for partsupp:
    unit cost = extendedprice DIV quantity over shipped lines — exact,
    quantities are whole). The decisive difference from Q15's one-row
    argmax: the MIN table scales with |part|, so it can NEVER be a
    broadcast or a driver collect — it joins back on p_partkey as a
    plain equi-join (AQE decides the strategy), and ties keep every
    matching supplier, exactly like the reference's subquery form.
    region->nation stays the only forced broadcast (constant-sized)."""
    nat = (
        tables["nation"]
        .join(
            F.broadcast(tables["region"].filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = tables["supplier"].join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    parts = tables["part"].filter(F.col("p_size") >= min_size).select(
        "p_partkey", "p_name", "p_size"
    )
    # one fact pass -> per-(part, supp) unit cost, restricted to the
    # region's suppliers and the qualifying parts BEFORE the aggregate
    cost = (
        tables["lineitem"]
        .select("l_partkey", "l_suppkey", F.expr(_UNIT_COST_SQL).alias("unit_cost_micro"))
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("unit_cost_micro").alias("supp_cost_micro"))
    )
    part_min = cost.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("supp_cost_micro").alias("_min_cost")
    )
    return (
        cost.join(
            part_min,
            (F.col("p_partkey") == F.col("_pk"))
            & (F.col("supp_cost_micro") == F.col("_min_cost")),
        )
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            _mi("s_acctbal").alias("s_acctbal_micro"), "supp_cost_micro",
        )
    )


def volume_shipping(
    tables: dict[str, DataFrame],
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """Q7 shape — one fact scan feeding TWO independent dim paths
    (supplier nation via l_suppkey, customer nation via orders ->
    customer), with the cross-nation pair filter (a,b) OR (b,a) applied
    where both paths meet. nation is constant-sized -> broadcast onto
    supplier/customer; supplier/customer/orders scale with SF ->
    unhinted, AQE decides. Grouped by (supp_nation, cust_nation,
    year) — year() stays a codegen expression, never a UDF."""
    nat = tables["nation"].filter(
        F.col("n_name").isin(nation_a, nation_b)
    ).select("n_nationkey", "n_name")
    supp = tables["supplier"].join(
        F.broadcast(nat.withColumnRenamed("n_name", "supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust = tables["customer"].join(
        F.broadcast(
            nat.withColumnRenamed("n_name", "cust_nation")
            .withColumnRenamed("n_nationkey", "_cnk")
        ),
        F.col("c_nationkey") == F.col("_cnk"),
    ).select("c_custkey", "cust_nation")
    ords = tables["orders"].select("o_orderkey", "o_custkey").join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "cust_nation")
    return (
        tables["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_disc_price_mi()).alias("revenue_micro"))
    )


def market_share(
    tables: dict[str, DataFrame],
    target_nation: str = "NATION_3",
    market_region: str = "ASIA",
    part_type: str = "PROMO",
) -> DataFrame:
    """Q8 shape — the conditional-share aggregate: per order-year, the
    target nation's slice of the region's market for one part type.
    The share is emitted as an EXACT (numerator, denominator) BIGINT
    micro pair — a float division would make the displayed ratio the
    only inexact number in the plan, so the caller divides at render
    time. Still one fact scan: part prunes it first (most selective),
    the customer-region path bounds the market, the supplier-nation
    CASE feeds the numerator."""
    parts = tables["part"].filter(F.col("p_type") == part_type).select("p_partkey")
    nat_r = (
        tables["nation"]
        .join(
            F.broadcast(tables["region"].filter(F.col("r_name") == market_region)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("_rnk"))
    )
    cust = tables["customer"].join(
        F.broadcast(nat_r), F.col("c_nationkey") == F.col("_rnk")
    ).select("c_custkey")
    ords = (
        tables["orders"]
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    supp = tables["supplier"].join(
        F.broadcast(tables["nation"].select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    dp = _disc_price_mi()
    return (
        tables["lineitem"]
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == target_nation, dp).otherwise(F.lit(0)))
            .alias("target_volume_micro"),
            F.sum(dp).alias("total_volume_micro"),
        )
    )


def product_profit(
    tables: dict[str, DataFrame],
    name_pattern: str = "%widget%",
) -> DataFrame:
    """Q9 shape — profit per (supplier nation, order year) for parts
    matching a name pattern. Fixture stand-in for ps_supplycost:
    cost = p_retailprice x quantity (micro-quantized, exact — the
    same row-local integer derivation as disc_price, so profit =
    dp_mi - cost_mi never leaves BIGINT). The part filter (LIKE) is
    the most selective predicate and prunes the fact before any other
    join; nation broadcasts; orders joins only for the year column."""
    parts = tables["part"].filter(F.col("p_name").like(name_pattern)).select(
        "p_partkey", _mi("p_retailprice").alias("_retail_mi")
    )
    supp = tables["supplier"].join(
        F.broadcast(tables["nation"].select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    ords = tables["orders"].select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    profit = (
        _disc_price_mi()
        - F.col("_retail_mi") * F.expr("CAST(round(l_quantity) AS BIGINT)")
    ).cast("bigint")
    return (
        tables["lineitem"]
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum(profit).alias("profit_micro"))
    )


def returned_item_customers(
    tables: dict[str, DataFrame],
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
    k: int = 20,
) -> DataFrame:
    """Q10 shape — group-then-top-k with the dims joined AFTER the cut.

    Revenue lost to returns per customer in one quarter, top-k
    customers. The scale-decisive ordering: aggregate on the fact's
    key, take the global top-k via the shared two-level pattern
    (partial per partition, <= k x P final), and only THEN join the k
    winners to customer/nation — the dims see k rows, not |customer|.
    Joining customer before the cut would drag name/nation columns
    through the fact-sized exchange for rows that lose the ranking."""
    ords = tables["orders"].filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    rev = (
        tables["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(_disc_price_mi()).alias("revenue_micro"))
    )
    top = two_level_topk(
        rev,
        group_cols=[],
        order_cols=[F.col("revenue_micro").desc(), F.col("o_custkey").asc()],
        k=k,
    )
    cust = tables["customer"].join(
        F.broadcast(tables["nation"].select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", _mi("c_acctbal").alias("c_acctbal_micro"), "n_name")
    return top.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "c_custkey", "c_name", "revenue_micro", "c_acctbal_micro", "n_name", "rank"
    )


def important_parts(
    tables: dict[str, DataFrame],
    nation: str = "NATION_5",
    fraction_ppm: int = 1000,
) -> DataFrame:
    """Q11 shape — group value vs a FRACTION of the global total.

    Per-part shipped value for one nation's suppliers, keeping parts
    whose value exceeds fraction_ppm/1e6 of the nation's total. The
    fact is scanned ONCE: the global total is an aggregate OF the
    per-part aggregate (config-sized input), broadcast back as one
    row, and the HAVING is the integer cross-multiplication
    unit_value x 1e6 > unit_total x ppm — no float fraction, no second
    fact scan. DEFINED SEMANTICS: both sides are first truncated to
    whole currency units (``value_micro DIV 1e6``) for BIGINT overflow
    headroom (peak product ~1e17 x 1e6 would overflow in micros), so
    decisions within 1e6 micros of the threshold follow the
    truncated-unit compare, not an exact micro compare — the DuckDB
    oracle mirrors the same truncation. Use a DECIMAL compare instead
    if sub-unit exactness at the threshold is ever required."""
    supp = tables["supplier"].join(
        F.broadcast(tables["nation"].filter(F.col("n_name") == nation)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = (
        tables["lineitem"]
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price_mi()).alias("value_micro"))
    )
    value_unit = F.expr(f"value_micro DIV {MICRO}")
    tot = per_part.agg(F.sum(value_unit).alias("_tot_unit"))
    return (
        per_part.join(F.broadcast(tot))
        .filter(value_unit * MICRO > F.col("_tot_unit") * fraction_ppm)
        .select("l_partkey", "value_micro")
    )


def late_shipment_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    late_days: int = 60,
) -> DataFrame:
    """Q12 shape — join + split conditional counts.

    Per line status (fixture stand-in for shipmode), how many LATE
    lines (shipped > late_days after the order date) belong to
    critical vs non-critical orders. The two counts come out of ONE
    aggregate as conditional sums — never two filtered passes. The
    lateness predicate is a non-equi residual on the orderkey equi-join
    (same rule as Q4: the date compare rides the join, it never forces
    a cross product), and the date-window filter prunes the fact scan
    first."""
    ords = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus", "l_shipdate")
        .join(
            ords,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
            ),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(crit.cast("bigint")).alias("high_line_count"),
            F.sum((~crit).cast("bigint")).alias("low_line_count"),
        )
    )


def promo_revenue_share(
    part: DataFrame,
    lineitem: DataFrame,
    promo_type: str = "PROMO",
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """Q14 shape — the conditional-numerator ratio, per ship month.

    promo share = revenue from PROMO parts / all revenue, emitted as
    the exact (numerator, denominator) BIGINT micro pair (the
    repo-wide rule: the only division happens at display time). The
    part side carries ONLY (partkey, is_promo) into the join — the
    boolean is computed before the join so the fact-sized exchange
    never carries the type string; part scales with SF, so the join is
    unhinted for AQE."""
    parts = part.select(
        "p_partkey", (F.col("p_type") == promo_type).alias("_is_promo")
    )
    dp = _disc_price_mi()
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("_is_promo"), dp).otherwise(F.lit(0)))
            .alias("promo_revenue_micro"),
            F.sum(dp).alias("total_revenue_micro"),
        )
        .select(
            F.unix_micros(F.col("ship_month")).alias("ship_month_us"),
            "promo_revenue_micro",
            "total_revenue_micro",
        )
    )


def small_quantity_revenue(
    part: DataFrame,
    lineitem: DataFrame,
    brand: str = "Brand#3",
    fraction_num: int = 1,
    fraction_den: int = 5,
) -> DataFrame:
    """Q17 shape — the correlated per-group AVG decorrelated as
    aggregate-then-join-back on the SAME fact.

    Revenue from lines of one brand whose quantity is below
    fraction x that part's average quantity. The per-part average
    joins back to the fact as an exact (sum, count) pair and the
    compare is the integer cross-multiplication

        qty x n x den < sum x num       (qty < num/den x sum/n)

    — no float average, no boundary row that flips between engines.
    Both the aggregate and the probe read the SAME brand-pruned fact
    subset: the part filter semi-joins the fact once, the per-part
    aggregate is derived FROM that subset (config-sized output), and
    the final compare is a partkey equi-join of the subset against
    its own aggregate — the fact is scanned once, not once per
    subquery."""
    pk = part.filter(F.col("p_brand") == brand).select("p_partkey")
    sub = (
        lineitem.select(
            "l_partkey",
            F.expr("CAST(round(l_quantity) AS BIGINT)").alias("_qty"),
            F.expr("CAST(round(l_extendedprice * 1e6) AS BIGINT)").alias("_price_mi"),
        )
        .join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
    )
    avg_q = sub.groupBy(F.col("l_partkey").alias("_apk")).agg(
        F.sum("_qty").alias("_sum_qty"), F.count("*").alias("_n")
    )
    return (
        sub.join(avg_q, F.col("l_partkey") == F.col("_apk"))
        .filter(
            F.col("_qty") * F.col("_n") * fraction_den
            < F.col("_sum_qty") * fraction_num
        )
        .agg(
            F.sum("_price_mi").alias("revenue_micro"),
            F.count("*").alias("n_lines"),
        )
    )


def banded_revenue(
    part: DataFrame,
    lineitem: DataFrame,
    bands: tuple[tuple[str, int, int, float, float], ...] = (
        ("Brand#1", 1, 10, 1.0, 15.0),
        ("Brand#2", 10, 25, 10.0, 30.0),
        ("Brand#3", 25, 50, 20.0, 50.0),
    ),
) -> DataFrame:
    """Q19 shape — the OR-of-ANDs disjunction evaluated in ONE pass.

    Revenue from lines matching ANY of three (brand, size-range,
    quantity-range) bands. The trap shape is three filtered scans
    UNION'd (three fact reads, three joins); the correct plan is one
    partkey equi-join with the whole disjunction as a single residual
    predicate — each conjunct mixes part columns (brand, size) with
    lineitem columns (quantity), so it can only run where the rows
    meet, and Catalyst still pushes the per-side implied bounds
    (size BETWEEN overall min/max, quantity BETWEEN overall min/max)
    down each scan. Emitted per band (conditional sums) plus the
    total — one aggregate, no union."""
    pr = part.select("p_partkey", "p_brand", "p_size")
    joined = lineitem.select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    ).join(pr, F.col("l_partkey") == F.col("p_partkey"))
    conds = [
        (F.col("p_brand") == b)
        & (F.col("p_size") >= slo)
        & (F.col("p_size") <= shi)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
        for (b, slo, shi, qlo, qhi) in bands
    ]
    any_band = conds[0]
    for c in conds[1:]:
        any_band = any_band | c
    dp = _disc_price_mi()
    aggs = [
        F.sum(F.when(c, dp).otherwise(F.lit(0))).alias(f"band{i}_revenue_micro")
        for i, c in enumerate(conds)
    ]
    return joined.filter(any_band).agg(
        *aggs, F.sum(dp).alias("revenue_micro"), F.count("*").alias("n_lines")
    )


def dominant_part_suppliers(
    tables: dict[str, DataFrame],
    name_prefix: str = "red",
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    share_num: int = 2,
    share_den: int = 3,
) -> DataFrame:
    """Q20 shape — the nested IN chain as a semi-join pipeline with a
    correlated-aggregate threshold.

    Suppliers who carried more than share (num/den) of some matching
    part's yearly volume (fixture stand-in for Q20's availqty >
    0.5 x shipped: the per-(part, supplier) volume against the
    per-part total; 2/3 calibrated so the cut keeps a strict subset —
    25 of 100 suppliers at sf0.01, never everyone). The chain runs bottom-up with ONE fact pass:

        part name filter (broadcast semi onto the fact)
        -> groupBy(part, supp) volume            [the inner aggregate]
        -> per-part totals derived FROM it        [aggregate of aggregate]
        -> integer cross-mult share cut           [den x v > num x tot]
        -> DISTINCT suppkey                       [the IN -> semi dedup]
        -> join supplier + broadcast nation       [outer query]

    Every IN becomes a semi-shaped step on an equi-key; nothing ever
    re-reads the fact or collects to the driver."""
    pk = tables["part"].filter(F.col("p_name").like(name_prefix + "%")).select(
        "p_partkey"
    )
    vol = (
        tables["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.expr("CAST(round(l_quantity) AS BIGINT)")).alias("_vol"))
    )
    totals = vol.groupBy(F.col("l_partkey").alias("_tpk")).agg(
        F.sum("_vol").alias("_tot")
    )
    winners = (
        vol.join(totals, F.col("l_partkey") == F.col("_tpk"))
        .filter(F.col("_vol") * share_den > F.col("_tot") * share_num)
        .select("l_suppkey")
        .distinct()
    )
    supp = tables["supplier"].join(
        F.broadcast(tables["nation"].select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return winners.join(
        supp, F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "n_name")
