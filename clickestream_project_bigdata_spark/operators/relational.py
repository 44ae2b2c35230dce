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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)
