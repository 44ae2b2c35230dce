"""General relational coverage: join/agg/sort/top-k queries over the TPC-H-ish
fixture star schema.

The reference implements zero joins (SURVEY §2.4) — its surface is covered by
the clickstream operators. These queries prove the engine's generic relational
path and pin the plans we want at scale:

* small dimensions (region/nation/supplier, and part at fixture SFs) are
  **broadcast** — no shuffle of the fact table for those joins;
* fact-fact joins (orders ⋈ lineitem) shuffle on the join key once and AQE
  handles skew;
* monetary aggregates run in DECIMAL so results are exact and reproducible
  (double summation order varies across engines/partitionings — unacceptable
  for a correctness-gated engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..sources.readers import read_parquet_table


def _dec(col: str):
    """Exact money: double → DECIMAL(18,4). Summed as decimal (exact,
    associative) then surfaced as double for a stable cross-engine value."""
    return F.col(col).cast("decimal(18,4)")


def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5-style: revenue per nation for customers in one region.

    Join order: fact (lineitem) shuffles once against orders; customer,
    nation, region are broadcast (dimension-sized). The region filter is
    applied *before* the broadcast so the hash table is minimal.
    """
    dims = (
        customer.join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "n_name")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


def top_orders_by_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    segment: str = "BUILDING",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-style shipping-priority top-k with a deterministic tiebreak
    (revenue DESC, orderkey ASC) so the limit is stable across engines."""
    seg_customers = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(seg_customers), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(k)
    )


def supplier_part_volume(lineitem: DataFrame, supplier: DataFrame, part: DataFrame) -> DataFrame:
    """Two broadcast joins against the fact table; per (supplier, brand)
    shipped quantity. Quantity is whole-valued so a plain double sum is exact."""
    return (
        lineitem.join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("s_name", "p_brand")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.count("*").alias("line_count"),
        )
    )


def customer_order_ranks(orders: DataFrame, customer: DataFrame, k: int = 3) -> DataFrame:
    """Window-function coverage on the relational side: each customer's top-k
    orders by value (row_number with deterministic tiebreak), joined to the
    broadcast customer dim."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    top = (
        orders.withColumn("order_rank", F.row_number().over(w))
        .filter(F.col("order_rank") <= k)
    )
    return top.join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey")).select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice", "order_rank"
    )


def pricing_rollup(lineitem: DataFrame) -> DataFrame:
    """Grouping-sets coverage: subtotals + grand total via ROLLUP
    (returnflag → returnflag×linestatus → total). One shuffle; Catalyst
    expands the grouping sets map-side."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


def orders_without_lineitems(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Anti-join coverage: orders with no lineitem rows."""
    return orders.join(
        lineitem.select("l_orderkey"), F.col("o_orderkey") == F.col("l_orderkey"), "left_anti"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


def late_shipment_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4-shaped EXISTS semi-join: count orders per priority that have
    at least one lineitem shipped AFTER the order date (the fixture lacks
    commit/receipt dates, so late-vs-order-date stands in for Q4's
    late-commit predicate).

    Plan shape: LEFT SEMI join on the order key with the extra non-equi
    condition evaluated inside the join — each order emits at most once no
    matter how many lineitems match, so the aggregate never double-counts
    and the shuffle carries order rows, not the (order × lineitem) blowup a
    join+distinct would."""
    return (
        orders.join(
            lineitem.select("l_orderkey", "l_shipdate"),
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def returnflag_priority_classes(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12-shaped conditional aggregation over the fact-fact join:
    per lineitem returnflag, how many lines belong to urgent/high-priority
    orders vs the rest. One shuffle join on the order key, then a
    map-side-combinable sum(when) pair."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.select("l_orderkey", "l_returnflag")
        .join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def promo_revenue_ratio(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14-shaped promotion-revenue share: percentage of discounted
    revenue from PROMO-type parts. Broadcast the part dim; both sums ride
    one aggregation in DECIMAL (exact, order-independent), divided once at
    the end."""
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    return (
        lineitem.join(broadcast(part.select("p_partkey", "p_type")),
                      F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)")))
            .alias("__promo"),
            F.sum(rev).alias("__total"),
        )
        .select(
            F.round(
                F.lit(100.0) * F.col("__promo").cast("double") / F.col("__total").cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


def _rev():
    """The discounted-revenue expression in exact DECIMAL."""
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def forecast_revenue(
    lineitem: DataFrame,
    ship_from: str = "1996-01-01",
    ship_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue-change: one filtered scan, one
    global sum of extendedprice*discount. Every predicate is scan-level
    (pushed to parquet row groups); the aggregate is a single partial+final
    pair — the cheapest possible plan shape, pinned here because Q6 is the
    canonical pushdown probe."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts(ship_from))
            & (F.col("l_shipdate") < _ts(ship_to))
            & (F.col("l_discount") >= F.lit(disc_lo))
            & (F.col("l_discount") <= F.lit(disc_hi))
            & (F.col("l_quantity") < F.lit(max_qty))
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    ship_from: str = "1996-01-01",
    ship_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7-shaped bilateral shipping volume: revenue between two
    nations per (supplier nation, customer nation, ship year), both
    directions. The nation dimension is joined TWICE under different roles
    — the aliased-dimension pattern; both sides pre-filtered to the two
    nations before broadcast so each hash table holds only relevant keys."""
    n2 = [nation_a, nation_b]
    supp = (
        supplier.join(
            broadcast(nation.filter(F.col("n_name").isin(n2))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        customer.join(
            broadcast(nation.filter(F.col("n_name").isin(n2))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts(ship_from)) & (F.col("l_shipdate") < _ts(ship_to))
        )
        .join(broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_3",
    region_name: str = "ASIA",
    part_type: str = "PROMO",
    order_from: str = "1995-01-01",
    order_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q8-shaped market share: within one region's customers and one
    part type, the share of yearly revenue supplied by ``target_nation``.
    Conditional-sum ratio rides ONE aggregation (numerator = sum(when),
    denominator = sum), so no self-join of the yearly totals."""
    cust_in_region = (
        customer.join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    joined = (
        lineitem.join(
            broadcast(part.filter(F.col("p_type") == part_type).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                (F.col("o_orderdate") >= _ts(order_from))
                & (F.col("o_orderdate") < _ts(order_to))
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == target_nation, _rev()).otherwise(zero))
            .alias("__n"),
            F.sum(_rev()).alias("__d"),
        )
        .select(
            "o_year",
            F.round(F.col("__n").cast("double") / F.col("__d").cast("double"), 6).alias(
                "mkt_share"
            ),
        )
    )


def product_profit_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_contains: str = "red",
) -> DataFrame:
    """TPC-H Q9-shaped product profit: discounted revenue per (supplier
    nation, order year) for parts whose name contains a substring. (The
    fixture has no partsupp/supplycost, so profit = discounted revenue —
    the join/agg shape is Q9's, the cost term is not.)"""
    named_parts = part.filter(F.col("p_name").contains(name_contains)).select("p_partkey")
    supp_nation = supplier.join(
        broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    return (
        lineitem.join(broadcast(named_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_rev()).cast("double").alias("sum_profit"))
    )


def returned_item_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    order_from: str = "1996-01-01",
    order_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shaped returned-item ranking: top-k customers by revenue
    lost to returns in one quarter. Orders pre-filtered to the quarter
    BEFORE the fact join (the selective side drives); customer+nation
    broadcast; deterministic tiebreak for the limit."""
    q_orders = orders.filter(
        (F.col("o_orderdate") >= _ts(order_from)) & (F.col("o_orderdate") < _ts(order_to))
    ).select("o_orderkey", "o_custkey")
    cust = customer.join(
        broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(q_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def customer_order_distribution(
    orders: DataFrame, customer: DataFrame, exclude_priority: str = "1-URGENT"
) -> DataFrame:
    """TPC-H Q13-shaped customer distribution: histogram of customers by
    how many (non-excluded) orders they placed — INCLUDING zero-order
    customers, which only a LEFT OUTER join surfaces (the fixture lacks
    o_comment, so a priority filter stands in for Q13's comment regex).
    Two aggregations: per-customer count, then the count-of-counts — both
    map-side combinable."""
    kept = orders.filter(F.col("o_orderpriority") != exclude_priority).select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(kept, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    ship_from: str = "1996-01-01",
    ship_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15-shaped top supplier: supplier(s) achieving the maximum
    quarterly revenue. The scalar max rides a single-row broadcast joined
    back against the per-supplier aggregate (no window over an
    unpartitioned frame, which would funnel all suppliers through one
    task)."""
    per_supp = (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts(ship_from)) & (F.col("l_shipdate") < _ts(ship_to))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("__rev"))
    )
    mx = per_supp.agg(F.max("__rev").alias("__mx"))
    return (
        per_supp.join(broadcast(mx), F.col("__rev") == F.col("__mx"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("__rev").cast("double").alias("total_revenue"),
        )
    )


def small_qty_order_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#12", qty_factor: float = 0.5
) -> DataFrame:
    """TPC-H Q17-shaped small-quantity revenue: for one brand's parts,
    revenue from lineitems below ``qty_factor`` × that part's average
    quantity, scaled to a weekly figure (/7). The per-part average is a
    fact-side self-aggregation joined back on the part key — both sides
    pre-filtered to the brand, so the shuffle carries only that brand's
    rows."""
    brand_parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    brand_lines = lineitem.join(
        broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    per_part_avg = brand_lines.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.avg("l_quantity").alias("__avg_qty")
    )
    return (
        brand_lines.join(broadcast(per_part_avg), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.lit(qty_factor) * F.col("__avg_qty"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 6).alias(
                "avg_weekly"
            )
        )
    )


def large_volume_customers(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_qty: float = 250.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18-shaped large-volume customers: orders whose total lineitem
    quantity exceeds ``min_qty``, with customer attribution, top-k by order
    value. The HAVING runs on the per-order aggregate FIRST (collapsing the
    fact table to order grain) and only the survivors join outward."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > F.lit(min_qty))
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(k)
    )


def disjunctive_part_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: three OR'd
    (brand, size range, quantity range) clauses evaluated inside one
    broadcast join. Pins that a disjunction across both sides still plans
    as ONE equi-join + residual filter, not three scans unioned."""
    clause = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return (
        lineitem.join(
            broadcast(part.select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(clause)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


def global_sales_opportunity(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nations: tuple[str, ...] = ("NATION_5", "NATION_7", "NATION_9", "NATION_11", "NATION_13"),
    anti_priority: str = "1-URGENT",
) -> DataFrame:
    """TPC-H Q22-shaped sales opportunity: per selected nation, the count
    and total balance of customers who (a) hold an above-average positive
    account balance and (b) have placed no ``anti_priority`` order. The
    scalar average is a 1-row broadcast cross join; the no-orders test is
    a LEFT ANTI against the filtered orders key set (the fixture keys
    nations directly, standing in for Q22's phone-prefix country codes;
    every fixture customer has SOME order, so the anti side filters to one
    priority to keep the predicate non-vacuous — Q22's plan shape, not its
    literal parameter)."""
    in_nations = customer.join(
        broadcast(nation.filter(F.col("n_name").isin(*nations))),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_acctbal", "n_name")
    # the scalar average runs in DECIMAL (exact, order-independent) then
    # surfaces as double — a double-accumulated avg varies in ulps across
    # engines/partitionings, and this value gates a filter
    avg_bal = in_nations.filter(F.col("c_acctbal") > 0).agg(
        F.avg(_dec("c_acctbal")).cast("double").alias("__avg_bal")
    )
    return (
        in_nations.crossJoin(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(
            orders.filter(F.col("o_orderpriority") == anti_priority).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")).cast("double"), 2).alias("totacctbal"),
        )
    )


def waiting_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nations: tuple[str, ...] = ("NATION_3", "NATION_7"),
    late_days: int = 60,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q21-shaped "suppliers who kept orders waiting": for finished
    (``o_orderstatus = 'F'``) multi-supplier orders, count per supplier the
    orders where that supplier was the ONLY late one. The fixture lacks
    commit/receipt dates (reference Q21 uses ``l_receiptdate >
    l_commitdate``), so "late" is adapted to ``l_shipdate > o_orderdate +
    late_days`` — same plan shape, different literal predicate.

    Plan shape: Q21's textbook form is EXISTS (another supplier on the
    order) + NOT EXISTS (another LATE supplier on the order) — two more
    correlated passes over the fact. Rewritten here as ORDER-GRAIN
    AGGREGATES, which is semantically identical and strictly cheaper at
    scale: "some other supplier exists" ⇔ the order has ≥ 2 distinct
    suppliers, and "no other late supplier" ⇔ the order has EXACTLY ONE
    late supplier (which is then the waiting one, recoverable as min).
    The fact is read twice (once filtered to late lines, once for the
    distinct-supplier count), both collapse to order grain before the
    only order-order join, and supplier/nation are broadcast — vs the
    EXISTS form's three fact-width shuffles. The oracle SQL keeps the
    EXISTS/NOT EXISTS spelling to pin the equivalence."""
    late = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), late_days))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    solo = (
        late.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("__nlate"),
            F.min("l_suppkey").alias("__waiting_sk"),
        )
        .filter(F.col("__nlate") == 1)
    )
    multi = (
        lineitem.groupBy(F.col("l_orderkey").alias("__ok"))
        .agg(F.countDistinct("l_suppkey").alias("__nsupp"))
        .filter(F.col("__nsupp") >= 2)
    )
    supp = supplier.join(
        broadcast(nation.filter(F.col("n_name").isin(*nations))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        solo.join(multi, F.col("l_orderkey") == F.col("__ok"), "left_semi")
        .join(broadcast(supp), F.col("__waiting_sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(k)
    )


def cheapest_supplier_per_part(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    p_type: str = "PROMO",
    max_size: int = 10,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier: for each part of a given
    type/size class, the supplier(s) offering the lowest observed unit
    price, with supplier attribution, ordered by account balance. The
    fixture has no ``partsupp`` table, so the part–supplier cost
    relationship is derived from shipped lineitems (``min`` of
    ``l_extendedprice / l_quantity`` per part+supplier) — Q2's correlated
    "cost = min cost over the part" argmin shape on the tables we have.

    Unit prices stay RAW doubles end to end: ``min`` and equality never
    accumulate error (unlike sums), so both engines see bit-identical
    values and the argmin tie set is stable — rounding here would only
    create cross-engine HALF_UP/HALF_EVEN mismatches. The per-part scalar
    min joins back as a broadcast (the aggregate is part-grain, tiny
    relative to the fact), and part/supplier/nation are broadcast dims.

    ``k`` feeds TakeOrderedAndProject, which materializes a size-``k``
    bounded priority queue PER PARTITION — keep it top-k-sized; for the
    full ordered result drop to ``.orderBy(...)`` without a limit rather
    than passing a huge ``k``."""
    wanted = part.filter(
        (F.col("p_type") == p_type) & (F.col("p_size") <= max_size)
    ).select("p_partkey")
    cost = (
        lineitem.join(
            broadcast(wanted), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    mn = cost.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.min("unit_cost").alias("__min_cost")
    )
    return (
        cost.join(
            broadcast(mn),
            (F.col("l_partkey") == F.col("__pk"))
            & (F.col("unit_cost") == F.col("__min_cost")),
        )
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(k)
    )


def important_part_values(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_3",
    fraction: float = 0.001,
) -> DataFrame:
    """TPC-H Q11-shaped important-stock identification: per part, the total
    discounted value supplied from one nation, keeping only parts whose
    value exceeds ``fraction`` of that nation's grand total. Adapted from
    partsupp (absent in the fixture) to shipped lineitem value — the HAVING
    vs correlated-scalar-subquery shape is what Q11 exercises.

    Both the per-part values and the grand total accumulate in exact
    DECIMAL, so the ``value > total * fraction`` gate is bit-stable across
    engines and partition orders; the grand total is a 1-row broadcast
    cross join, and the per-part aggregate is computed ONCE — the total
    re-aggregates the part-grain result, not the fact table."""
    nation_lines = lineitem.join(
        broadcast(
            supplier.join(
                broadcast(nation.filter(F.col("n_name") == nation_name)),
                F.col("s_nationkey") == F.col("n_nationkey"),
            ).select("s_suppkey")
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    # sums accumulate in exact DECIMAL; the threshold compare happens in
    # double AFTER both sides are final (decimal*decimal at the combined
    # precision would overflow 38 digits and round engine-specifically)
    per_part = nation_lines.groupBy("l_partkey").agg(F.sum(_rev()).alias("__vald"))
    total = per_part.agg(
        (F.sum("__vald").cast("double") * F.lit(fraction)).alias("__cut")
    )
    return (
        per_part.crossJoin(broadcast(total))
        .filter(F.col("__vald").cast("double") > F.col("__cut"))
        .select("l_partkey", F.col("__vald").cast("double").alias("part_value"))
    )


def part_supplier_counts(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    excl_brand: str = "Brand#12",
    excl_type: str = "PROMO",
    sizes: tuple[int, ...] = (1, 4, 9, 14, 19, 24, 29, 34),
) -> DataFrame:
    """TPC-H Q16-shaped parts/supplier relationship: how many distinct
    suppliers ship each (brand, type, size) class, excluding one brand,
    one type, and suppliers flagged by "complaints" (adapted to
    ``s_acctbal < 0`` — the fixture's supplier comments don't exist).
    Derived from lineitem in place of the absent partsupp table.

    The exclusion list is a LEFT ANTI against a broadcast of the flagged
    supplier keys (NOT a ``NOT IN`` subquery, whose NULL semantics Spark
    and engines generally trip over), the part predicate prunes before the
    join, and the distinct-count shuffles only (brand, type, size,
    suppkey) — the fact collapses to the distinct quad before the final
    count."""
    wanted = part.filter(
        (F.col("p_brand") != excl_brand)
        & (F.col("p_type") != excl_type)
        & (F.col("p_size").isin(*sizes))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(broadcast(flagged), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(broadcast(wanted), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def potential_part_promotion(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_prefix: str = "red",
    year_start: str = "2000-01-01",
    year_end: str = "2001-01-01",
    nations: tuple[str, ...] = ("NATION_7", "NATION_8", "NATION_9"),
) -> DataFrame:
    """TPC-H Q20-shaped "potential part promotion": suppliers in a nation
    group who are ramping up on prefix-named parts. Reference Q20 gates
    ``ps_availqty > 0.5 * [year's shipped qty]``; the fixture has no
    partsupp, so the excess-stock test is adapted to "this supplier's
    shipped quantity of the part IN the year exceeds 20% of their
    all-time shipped quantity of it" — same nested-semi-join shape
    (part-name filter → correlated per-(part,supplier) aggregate
    threshold → distinct suppliers → nation filter), different literal.

    Plan shape: the prefix-filtered part keys broadcast into a semi-join
    so only matching lines aggregate; the year/all-time split is a
    CONDITIONAL SUM in one (suppkey, partkey)-keyed pass (Q20's textbook
    correlated subquery would re-scan the fact per pair); the threshold
    compares exact DECIMAL sums integer-scaled (``5·qty_yr > qty_all``,
    no 0.2 double multiply) so the gate is bit-stable across engines;
    and the qualifying supplier set collapses to distinct keys before
    the broadcast join to supplier×nation. Output: (s_name, s_acctbal)
    ordered by name."""
    red = part.filter(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    in_year = (F.col("l_shipdate") >= _ts(year_start)) & (
        F.col("l_shipdate") < _ts(year_end)
    )
    pair = (
        lineitem.select("l_suppkey", "l_partkey", "l_shipdate", "l_quantity")
        .join(broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_year, _dec("l_quantity")).otherwise(F.lit(0).cast("decimal(18,4)"))).alias("__qty_yr"),
            F.sum(_dec("l_quantity")).alias("__qty_all"),
        )
    )
    qual = (
        pair.filter(F.col("__qty_yr") * 5 > F.col("__qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    supp = supplier.join(
        broadcast(nation.filter(F.col("n_name").isin(*nations))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal")
    return (
        supp.join(broadcast(qual), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def discount_elasticity(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Per part-type Pearson correlation between discount and quantity —
    the "do discounts move volume" diagnostic. Spark's ``corr`` is a
    double accumulation (partition-order-dependent in the last ulps), so
    the five moments n, Σx, Σy, Σxy, Σx², Σy² accumulate in EXACT
    DECIMAL and the closed-form correlation is evaluated in double from
    those exact values — reproducible on any engine and any partitioning.
    Degenerate types (zero variance on either side) emit NULL.

    One broadcast dim join, one part-type-keyed aggregate carrying six
    numbers — nothing else shuffles. Output: (p_type, n_lines,
    avg_discount, avg_quantity, corr_disc_qty)."""
    x = _dec("l_discount")
    y = _dec("l_quantity")
    stats = (
        lineitem.join(
            broadcast(part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_type")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(x).alias("__sx"),
            F.sum(y).alias("__sy"),
            F.sum(x * y).alias("__sxy"),
            F.sum(x * x).alias("__sxx"),
            F.sum(y * y).alias("__syy"),
        )
    )
    n = F.col("n_lines").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return stats.select(
        "p_type",
        "n_lines",
        F.round(sx / n, 6).alias("avg_discount"),
        F.round(sy / n, 6).alias("avg_quantity"),
        F.when(
            (vx > 0) & (vy > 0),
            F.round((n * sxy - sx * sy) / F.sqrt(vx * vy), 6),
        ).alias("corr_disc_qty"),
    )


def order_gap_stats(orders: DataFrame) -> DataFrame:
    """Per-customer order inter-arrival profile (repeat-purchase cadence):
    gap days between consecutive orders in (date, orderkey) order —
    (n_gaps, avg/min/max gap). Customers with one order produce no row.

    One window on the customer key (same exchange the per-customer agg
    reuses), integer day gaps, DECIMAL-summed average — deterministic
    across engines."""
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    gaps = (
        orders.select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn("__prev", F.lag("o_orderdate").over(w))
        .filter(F.col("__prev").isNotNull())
        .withColumn("__gap_days", F.datediff("o_orderdate", "__prev"))
    )
    return gaps.groupBy("o_custkey").agg(
        F.count("*").alias("n_gaps"),
        F.round(
            F.avg(F.col("__gap_days").cast("decimal(18,6)")).cast("double"), 6
        ).alias("avg_gap_days"),
        F.min("__gap_days").alias("min_gap_days"),
        F.max("__gap_days").alias("max_gap_days"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str,
    right_ts_col: str | None = None,
    value_cols: tuple[str, ...] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Point-in-time (as-of) join: for every left row, attach the LATEST
    right row of the same ``by`` key with ``right.ts <= left.ts`` — the
    feature-store / market-data join Spark's API lacks (DuckDB/kdb ASOF
    JOIN semantics; a left row with no prior right row keeps NULLs).

    Spark-first shape: no range-condition join (which Catalyst would plan
    as a broadcast-nested-loop or an exploding theta join). Instead, UNION
    the two sides tagged, hash-partition once on ``by``, and carry the
    right side's values forward with ``last(..., ignorenulls=True)`` over
    an ordered running frame — one shuffle, one sort, linear in rows; ties
    (equal timestamps) order the right row first, so an exactly-equal
    timestamp matches (the ``<=`` contract).

    ``right`` must be unique per (by, ts); pre-aggregate if not. The
    matched right timestamp is surfaced as ``{right_ts}{suffix}``.

    All carried values ride in ONE struct through a single
    ``last(ignorenulls=True)`` — the struct is non-null for every right row
    even when its members are NULL, so a left row always receives every
    value column from the SAME matched right row (a per-column carry would
    skip genuine NULLs and mix rows: right rows (t=1, v=5), (t=2, v=NULL)
    must yield v=NULL at t=3, not v=5).
    """
    rts = right_ts_col or ts_col
    vals = list(value_cols) or [
        c for c in right.columns if c not in (by, rts)
    ]
    rhs = right.select(
        F.col(by),
        F.col(rts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(
            *[F.col(c).alias(f"v_{c}") for c in vals],
            F.col(rts).alias("__matched_ts"),
        ).alias("__r"),
    )
    lhs = left.select(
        F.col(by),
        F.col(ts_col).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(rhs.schema["__r"].dataType).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    rhs = rhs.withColumn("__l", F.lit(None).cast(lhs.schema["__l"].dataType))
    w = (
        Window.partitionBy(by)
        .orderBy(F.asc("__t"), F.asc("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "__is_left",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__c"),
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"__c.v_{c}").alias(c if c not in left.columns else c + suffix)
            for c in vals
        ],
        F.col("__c.__matched_ts").alias(f"{rts}{suffix}"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by: str | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval containment join: left rows matched to every right interval
    with ``start <= ts <= end`` (and equal ``by`` key if given) — without
    the broadcast-nested-loop plan Catalyst produces for a raw
    range-condition join.

    Bucket decomposition: both sides map onto fixed ``bucket_seconds`` time
    buckets — the left row to its single bucket, the right interval
    EXPLODED to every bucket it covers — then an equi-join on
    ([by,] bucket) followed by the exact range filter. Each (row, interval)
    pair meets in exactly one bucket (the row's own), so no dedup is
    needed. Shuffle carries the equi-key only; per-task fan-out is bounded
    by interval_length / bucket_seconds — size ``bucket_seconds`` to the
    typical interval length.
    """
    lb = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
    rb_start = F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds)
    rb_end = F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds)
    lhs = left.withColumn("__bucket", lb)
    rhs = right.withColumn(
        "__bucket", F.explode(F.sequence(rb_start, rb_end))
    )
    keys = ["__bucket"] + ([by] if by else [])
    return (
        lhs.join(rhs, keys)
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: str | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval×interval overlap join: pairs with
    ``l.start <= r.end AND r.start <= l.end`` (equal ``by`` key if given),
    bucket-decomposed like :func:`range_join` so Catalyst never falls back
    to a nested-loop plan.

    Both sides explode onto the fixed-width buckets they cover; the join
    keeps a pair only in the FIRST bucket both cover —
    ``floor(max(l.start, r.start) / w)``, which overlap guarantees both
    sides explode to — so each overlapping pair matches exactly once and
    no dedup shuffle is needed. Column names (besides ``by``) must be
    disjoint between the two frames."""
    w = bucket_seconds
    lhs = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(left_start)) / w),
                F.floor(F.unix_timestamp(F.col(left_end)) / w),
            )
        ),
    )
    rhs = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(right_start)) / w),
                F.floor(F.unix_timestamp(F.col(right_end)) / w),
            )
        ),
    )
    keys = ["__bucket"] + ([by] if by else [])
    first_common = F.floor(
        F.greatest(
            F.unix_timestamp(F.col(left_start)), F.unix_timestamp(F.col(right_start))
        )
        / w
    )
    return (
        lhs.join(rhs, keys)
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (F.col("__bucket") == first_common)
        )
        .drop("__bucket")
    )


def scd2_history(
    df: DataFrame,
    key_col: str = "visitorid",
    attr_col: str = "event",
    time_col: str = "event_time",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension history: collapse a per-key event
    stream into VERSIONED VALIDITY RANGES of ``attr_col`` — one row per
    run of consecutive equal values, with ``valid_from`` / ``valid_to``
    half-open bounds (open ``valid_to`` = current version). The build step
    of every warehouse dimension-history table;
    ``sessionize.latest_event_state`` is the keep-latest degenerate form
    (current row only), this keeps the full history.

    Ordering must be TOTAL for determinism: pass tie-breaking
    ``order_cols`` (e.g. an event id) when ``time_col`` can tie.
    Run detection is NULL-SAFE (``eqNullSafe``): a NULL attribute is a
    value like any other, not a forced version break.

    Scale shape: gaps-and-islands on ONE key-hash exchange (same shape as
    sessionization: lag + running sum over the per-key window), then the
    run-grain rollup and the valid_to lead both ride windows over the
    already-collapsed run grain — the fact crosses the wire once. Output
    (key, version, attr_col, valid_from, valid_to, n_events)."""
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(attr_col).over(w)
    is_new = F.when(
        (F.row_number().over(w) == 1)
        | ~F.col(attr_col).eqNullSafe(prev),
        1,
    ).otherwise(0)
    runs = (
        df.withColumn("__v", F.sum(is_new).over(w))
        .groupBy(key_col, F.col("__v").cast("int").alias("version"))
        .agg(
            F.min(attr_col).alias(attr_col),
            F.min(time_col).alias("valid_from"),
            F.count("*").cast("long").alias("n_events"),
        )
    )
    wv = Window.partitionBy(key_col).orderBy(F.asc("version"))
    return runs.select(
        key_col,
        "version",
        attr_col,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
    )  # no trailing sort: per-key-version grain is unbounded at scale and
    # the comparison is order-insensitive (VERDICT r7 #5)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)
