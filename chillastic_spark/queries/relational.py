"""Relational surface: TPC-H-style analytics on the star schema.

The reference engine has no joins/windows (SURVEY §2.3) — Spark's
DataFrame API provides them; these queries pin that surface against the
duckdb oracle and double as the bench headliners.

Exactness: doubles are cast to DECIMAL before summing (bit-identical
across engines), results cast back to double and rounded.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chillastic_spark import functions as CF
from chillastic_spark.queries import Query
from chillastic_spark.tables import load


def _dec(col: str, prec: int, scale: int):
    return F.col(col).cast(f"decimal({prec},{scale})")


def _money(c):  # exact cents
    return c.cast("decimal(18,2)")


# --------------------------------------------------------------------- q1


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 flavour: pricing summary report.

    Single scan → hash agg; Catalyst pushes the shipdate filter to
    parquet; partial aggregation map-side (8 aggs over 2 group keys).
    fanout=True (r10): the shipdate filter keeps ~98% of rows, so the
    scan-fused decimal aggregation dominates — on a parallelism-starved
    layout (single row group) the adaptive fan-out parallelizes it
    (measured 0.77x; no-op on well-split inputs, where the filter
    keeps its PushedFilters row-group pruning).
    """
    l = load(spark, sf_dir, "lineitem", fanout=True)
    qty = _dec("l_quantity", 12, 2)
    ep = _dec("l_extendedprice", 14, 2)
    disc = _dec("l_discount", 4, 2)
    tax = _dec("l_tax", 4, 2)
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = ep * (one - disc)
    charge = disc_price * (one + tax)
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(ep), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            CF.round_det(F.sum(qty).cast("double") / F.count(F.lit(1)), 4).alias("avg_qty"),
            CF.round_det(F.sum(ep).cast("double") / F.count(F.lit(1)), 4).alias("avg_price"),
            CF.round_det(F.sum(disc).cast("double") / F.count(F.lit(1)), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity::DECIMAL(12,2)), 2)::DOUBLE AS sum_qty,
  round(sum(l_extendedprice::DECIMAL(14,2)), 2)::DOUBLE AS sum_base_price,
  round(sum(l_extendedprice::DECIMAL(14,2) * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS sum_disc_price,
  round(sum((l_extendedprice::DECIMAL(14,2) * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(4,2))) * (1.00::DECIMAL(3,2) + l_tax::DECIMAL(4,2))), 2)::DOUBLE AS sum_charge,
  floor((sum(l_quantity::DECIMAL(12,2))::DOUBLE / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
  floor((sum(l_extendedprice::DECIMAL(14,2))::DOUBLE / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
  floor((sum(l_discount::DECIMAL(4,2))::DOUBLE / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------- q3


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 flavour. customer is tiny → broadcast; orders⋈lineitem
    shuffles on o_orderkey only."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    ep = _dec("l_extendedprice", 14, 2)
    disc = _dec("l_discount", 4, 2)
    one = F.lit(1).cast("decimal(3,2)")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(ep * (one - disc)), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
  round(sum(l_extendedprice::DECIMAL(14,2) * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS revenue,
  o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------- q5


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 flavour: all dims broadcast; single big-table shuffle."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load(spark, sf_dir, "lineitem")
    ep = _dec("l_extendedprice", 14, 2)
    disc = _dec("l_discount", 4, 2)
    one = F.lit(1).cast("decimal(3,2)")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(ep * (one - disc)), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT n_name,
  round(sum(l_extendedprice::DECIMAL(14,2) * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------- q6


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 flavour: pure scan+filter+agg — the predicate-pushdown
    showcase (all three filters reach the parquet reader)."""
    l = load(spark, sf_dir, "lineitem")
    ep = _dec("l_extendedprice", 14, 2)
    disc = _dec("l_discount", 4, 2)
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(ep * disc), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT
  round(sum(l_extendedprice::DECIMAL(14,2) * l_discount::DECIMAL(4,2)), 2)::DOUBLE AS revenue,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


# ----------------------------------------------------------- top customers


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum(_money(F.col("o_totalprice"))), 2).cast("double").alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name,
  round(sum(o_totalprice::DECIMAL(18,2)), 2)::DOUBLE AS total_spent,
  count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey
LIMIT 10
"""


# ------------------------------------------------------------ market share


def nation_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per customer nation with order-status breakdown (grouping
    over a broadcast-joined dimension chain)."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_money(F.col("o_totalprice"))), 2).cast("double").alias("total_price"),
        )
        .orderBy("n_name", "o_orderstatus")
    )


NATION_ORDER_STATS_SQL = """
SELECT n_name, o_orderstatus, count(*) AS n_orders,
  round(sum(o_totalprice::DECIMAL(18,2)), 2)::DOUBLE AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, o_orderstatus
ORDER BY n_name, o_orderstatus
"""


QUERIES: dict[str, Query] = {
    "q1_pricing_summary": Query(q1_pricing_summary, Q1_SQL, headline=True),
    "q3_shipping_priority": Query(q3_shipping_priority, Q3_SQL, headline=True),
    "q5_local_supplier_volume": Query(q5_local_supplier_volume, Q5_SQL, headline=True),
    "q6_forecast_revenue": Query(q6_forecast_revenue, Q6_SQL, headline=True),
    "top_customers": Query(top_customers, TOP_CUSTOMERS_SQL),
    "nation_order_stats": Query(nation_order_stats, NATION_ORDER_STATS_SQL),
}
