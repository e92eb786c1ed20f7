"""Analytical query shapes over the relational side tables.

The driver's testdata ships TPC-H-ish tables (lineitem / orders /
customer / supplier / nation / region / part) alongside the transcript
carrier; these four queries exercise the classic OLAP plan shapes on
them — each one is a distinct physical pattern the engine must get
right at 100 TB, and each is written so Catalyst produces exactly that
pattern (asserted in tests/test_analytics.py):

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
