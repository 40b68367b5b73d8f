"""Relational batch 5: the remaining classic TPC-H query *shapes*,
adapted to the reduced star schema (no partsupp / shipmode / commitdate
columns in the testdata) — market share, profit-by-nation, CASE-sum
priority counts, outer-join distributions, scalar-subquery filters,
EXISTS/NOT-EXISTS anti-join chains, and correlated-min selection.

The reference engine (SURVEY §2.3/§2.4) has none of these; they pin
Spark's join/subquery planner against the duckdb oracle. Exactness
follows the repo contract: DECIMAL sums, identical expression trees on
both engines, ranked by rounded scores with id tie-breaks.
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


def _disc_price():
    one = F.lit(1).cast("decimal(3,2)")
    return _dec("l_extendedprice", 14, 2) * (one - _dec("l_discount", 4, 2))


_DP_SQL = "l_extendedprice::DECIMAL(14,2) * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(4,2))"


# ------------------------------------------------------------- q2 flavour


def q2_min_cost_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated min): parts priced at the minimum
    retail price within their brand. The correlated scalar subquery
    becomes a window min — one shuffle on p_brand, no self-join."""
    p = load(spark, sf_dir, "part")
    price = _dec("p_retailprice", 12, 2)
    w = Window.partitionBy("p_brand")
    return (
        p.withColumn("_price", price)
        .withColumn("_mn", F.min("_price").over(w))
        .filter(F.col("_price") == F.col("_mn"))
        .select(
            "p_partkey",
            "p_brand",
            F.col("_price").cast("double").alias("min_price"),
        )
        .orderBy("p_brand", "p_partkey")
    )


Q2_SQL = """
SELECT p_partkey, p_brand, p_retailprice::DECIMAL(12,2)::DOUBLE AS min_price
FROM part
WHERE p_retailprice::DECIMAL(12,2) = (
  SELECT min(p2.p_retailprice::DECIMAL(12,2)) FROM part p2
  WHERE p2.p_brand IS NOT DISTINCT FROM part.p_brand
)
ORDER BY p_brand, p_partkey
"""
# IS NOT DISTINCT FROM: the Spark window partitions NULL brands into ONE
# group and emits their min-priced rows; a plain `=` correlation would
# silently exclude every NULL-brand part from the oracle.


# ------------------------------------------------------------- q8 flavour


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of PROMO-part revenue sold to
    AMERICA customers, per year. Conditional-sum ratio over a 6-way
    join — every dim broadcast, lineitem shuffles once on l_orderkey."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("sn_key")
    )
    n1 = load(spark, sf_dir, "nation")
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key2"), F.col("n_name").alias("supp_nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    dp = _disc_price()
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("sn_key") == F.col("sn_key2"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", dp).otherwise(zero)).alias("_num"),
            F.sum(dp).alias("_den"),
        )
        .select(
            "o_year",
            CF.round_det(F.col("_num").cast("double") / F.col("_den").cast("double"), 6).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT year(o_orderdate) AS o_year,
  {CF.round_det_sql(f"sum(CASE WHEN n2.n_name = 'NATION_3' THEN {_DP_SQL} ELSE 0.0000::DECIMAL(18,4) END)::DOUBLE / sum({_DP_SQL})::DOUBLE", 6)} AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------------- q9 flavour


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: widget-part revenue by supplier nation × order
    year (partsupp-less profit proxy)."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
  round(sum({_DP_SQL}), 2)::DOUBLE AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


# ------------------------------------------------------------ q11 flavour


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds 1.5× the average
    part revenue — HAVING against a scalar subquery (Catalyst: two aggs
    over one shuffled child, threshold broadcast back). The threshold is
    scale-free (relative to the mean, not a fixed total fraction)."""
    l = load(spark, sf_dir, "lineitem")
    per = l.groupBy("l_partkey").agg(F.sum(_disc_price()).alias("_r"))
    total = per.agg(
        (F.sum("_r").cast("double") / F.count(F.lit(1))).alias("_avg")
    )
    return (
        per.crossJoin(F.broadcast(total))
        .filter(F.col("_r").cast("double") > F.col("_avg") * 1.5)
        .select(
            "l_partkey", F.round(F.col("_r"), 2).cast("double").alias("part_value")
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = f"""
WITH per AS (
  SELECT l_partkey, sum({_DP_SQL}) AS _r FROM lineitem GROUP BY 1
)
SELECT l_partkey, round(_r, 2)::DOUBLE AS part_value
FROM per
WHERE _r::DOUBLE > (SELECT sum(_r)::DOUBLE / count(*) FROM per) * 1.5
ORDER BY part_value DESC, l_partkey
"""


# ------------------------------------------------------------ q12 flavour


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode-less): per ship year, finished lines
    split into high/low order-priority CASE-sum counts."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_linestatus") == "F")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


Q12_SQL = """
SELECT year(l_shipdate) AS ship_year,
  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_linestatus = 'F'
GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------------ q13 flavour


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer, zero
    included — LEFT OUTER join with an extra join-predicate, then a
    double aggregation."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    return (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ------------------------------------------------------------ q15 flavour


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max revenue in 1997Q1. The scalar
    max is a 1-row aggregate broadcast back onto the revenue view
    (equality join on the rounded revenue keeps it exact) — a global
    window max would funnel every supplier through one task at fact
    scale, this shape keeps the per-supplier aggregate fully parallel."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = l.groupBy("l_suppkey").agg(
        F.round(F.sum(_disc_price()), 2).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, round(sum({_DP_SQL}), 2)::DOUBLE AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ------------------------------------------------------------ q16 flavour


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem as the part↔supplier relation):
    distinct suppliers per (brand, type, size), small parts, one brand
    excluded — COUNT(DISTINCT) after a distinct-projection shuffle."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 25)
    )
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size <= 25
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ------------------------------------------------------------ q17 flavour


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small orders — lineitems below 20% of
    their part's average quantity. The correlated avg becomes a per-part
    aggregate joined back (AQE picks broadcast when the agg is small)."""
    l = load(spark, sf_dir, "lineitem")
    qty = _dec("l_quantity", 12, 2)
    avg_q = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("_avg")
    )
    return (
        l.join(avg_q, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("_avg"))
        .agg(
            CF.round_det(
                F.sum(_dec("l_extendedprice", 14, 2)).cast("double") / F.lit(7.0), 2
            ).alias("avg_yearly")
        )
    )


Q17_SQL = f"""
SELECT {CF.round_det_sql("sum(l_extendedprice::DECIMAL(14,2))::DOUBLE / 7.0", 2)} AS avg_yearly
FROM lineitem l
JOIN (
  SELECT l_partkey AS _pk, sum(l_quantity::DECIMAL(12,2))::DOUBLE / count(*) AS _avg
  FROM lineitem GROUP BY 1
) a ON l.l_partkey = a._pk
WHERE l.l_quantity < 0.2 * a._avg
"""


# ------------------------------------------------------------ q20 flavour


def q20_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers that shipped >300 units of small-*
    parts during 1997 — nested IN-subqueries become an agg + semi-join
    chain."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    s = load(spark, sf_dir, "supplier")
    qualified = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity", 12, 2)).alias("_q"))
        .filter(F.col("_q") > F.lit(300).cast("decimal(12,2)"))
        .select("l_suppkey")
    )
    return (
        s.join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING sum(l_quantity::DECIMAL(12,2)) > 300
)
ORDER BY s_suppkey
"""


# ------------------------------------------------------------ q21 flavour


def q21_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (commitdate-less): suppliers whose lineitem was
    returned in a multi-supplier order where NO other supplier's line
    was returned — the EXISTS / NOT-EXISTS pair maps to a left-semi plus
    a left-anti self-join on l_orderkey."""
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = l.filter(F.col("l_returnflag") == "R")
    others = l.select(F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk"))
    others_r = l1.select(F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk"))
    cond = (F.col("l_orderkey") == F.col("_ok")) & (F.col("l_suppkey") != F.col("_sk"))
    return (
        l1.join(others, cond, "left_semi")
        .join(others_r, cond, "left_anti")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# ------------------------------------------------------------ q22 flavour


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, aggregated by nation — scalar avg subquery + NOT EXISTS
    anti-join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    bal = _dec("c_acctbal", 12, 2)
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(bal).cast("double") / F.count(F.lit(1))).alias("_avg"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(bal), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SQL = """
SELECT c_nationkey, count(*) AS numcust,
  round(sum(c_acctbal::DECIMAL(12,2)), 2)::DOUBLE AS totacctbal
FROM customer c
WHERE c_acctbal > (
    SELECT sum(c_acctbal::DECIMAL(12,2))::DOUBLE / count(*)
    FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


QUERIES: dict[str, Query] = {
    "q2_min_cost_parts": Query(q2_min_cost_parts, Q2_SQL),
    "q8_market_share": Query(q8_market_share, Q8_SQL),
    "q9_product_profit": Query(q9_product_profit, Q9_SQL),
    "q11_important_parts": Query(q11_important_parts, Q11_SQL),
    "q12_priority_shipping": Query(q12_priority_shipping, Q12_SQL),
    "q13_customer_distribution": Query(q13_customer_distribution, Q13_SQL),
    "q15_top_supplier": Query(q15_top_supplier, Q15_SQL),
    "q16_part_supplier_counts": Query(q16_part_supplier_counts, Q16_SQL),
    "q17_small_quantity_revenue": Query(q17_small_quantity_revenue, Q17_SQL),
    "q20_bulk_suppliers": Query(q20_bulk_suppliers, Q20_SQL),
    "q21_sole_returned_supplier": Query(q21_sole_returned_supplier, Q21_SQL),
    "q22_dormant_customers": Query(q22_dormant_customers, Q22_SQL),
}
