"""Second relational batch: semi/anti joins with aggregation subqueries,
rollup grouping sets, conditional aggregation, returned-item top-k —
rounding out the relational surface Spark provides beyond the reference
(SURVEY §2.3-2.6)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chillastic_spark import functions as CF
from chillastic_spark.queries import Query
from chillastic_spark.tables import load


def _dec(col: str, prec: int, scale: int):
    return F.col(col).cast(f"decimal({prec},{scale})")


# ------------------------------------------------------- q4: late shipping


def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 flavour: orders with ≥1 lineitem shipped >90 days after
    order date, counted per priority — left_semi against an interval
    condition."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    late_orders = o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late_orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------- q10: returned revenue


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 flavour: revenue lost to returns per customer, top 20."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    ep = _dec("l_extendedprice", 14, 2)
    disc = _dec("l_discount", 4, 2)
    one = F.lit(1).cast("decimal(3,2)")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(ep * (one - disc)), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
  round(sum(l_extendedprice::DECIMAL(14,2) * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ------------------------------------------------------ q14: promo revenue


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 flavour: PROMO parts' share of revenue — conditional
    aggregation over a broadcast join."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    ep = _dec("l_extendedprice", 14, 2)
    disc = _dec("l_discount", 4, 2)
    one = F.lit(1).cast("decimal(3,2)")
    rev = ep * (one - disc)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(20,4)")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            CF.round_det(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_pct"),
            F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
        )
    )


Q14_SQL = """
SELECT
  floor((100.0 * sum(CASE WHEN p_type = 'PROMO'
        THEN l_extendedprice::DECIMAL(14,2) * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(4,2))
        ELSE 0.0000::DECIMAL(20,4) END)::DOUBLE
      / sum(l_extendedprice::DECIMAL(14,2) * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(4,2)))::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS promo_pct,
  round(sum(l_extendedprice::DECIMAL(14,2) * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# ------------------------------------------------- q18: large-volume orders


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 flavour: orders whose total quantity exceeds 150 —
    agg-subquery semi-join, then enrich with customer."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum(_dec("l_quantity", 12, 2)), 2).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity::DECIMAL(12,2)), 2)::DOUBLE AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity::DECIMAL(12,2)), 2)::DOUBLE > 150
) JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


# ------------------------------------------------------ q7: nation trade


def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 flavour: yearly trade volume between customer-nation and
    supplier-nation pairs (both dims broadcast twice under different
    aliases)."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    ep = _dec("l_extendedprice", 14, 2)
    disc = _dec("l_discount", 4, 2)
    one = F.lit(1).cast("decimal(3,2)")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(ep * (one - disc)), 2).cast("double").alias("volume"))
        .filter(F.col("volume") > 0)
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


Q7_SQL = """
SELECT cust_nation, supp_nation, l_year,
       round(sum(vol), 2)::DOUBLE AS volume
FROM (
  SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice::DECIMAL(14,2) * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(4,2)) AS vol
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE cn.n_name != sn.n_name)
GROUP BY cust_nation, supp_nation, l_year
HAVING round(sum(vol), 2)::DOUBLE > 0
ORDER BY cust_nation, supp_nation, l_year
"""


# --------------------------------------- correlated subquery (above avg)


def above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with account balance above their nation's average —
    the correlated-subquery pattern as a window over the nation
    partition (one shuffle, no rescan)."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    return (
        c.withColumn(
            "nation_avg",
            CF.round_det(
                F.sum(bal).over(w).cast("double") / F.count(F.lit(1)).over(w), 2
            ),
        )
        .filter(F.col("c_acctbal").cast("decimal(18,2)").cast("double") > F.col("nation_avg"))
        .select("c_custkey", "c_name", "c_nationkey",
                bal.cast("double").alias("acctbal"), "nation_avg")
        .orderBy("c_custkey")
    )


ABOVE_AVG_SQL = """
SELECT c_custkey, c_name, c_nationkey,
       c_acctbal::DECIMAL(18,2)::DOUBLE AS acctbal, nation_avg
FROM (
  SELECT *,
    floor((sum(c_acctbal::DECIMAL(18,2)) OVER w ::DOUBLE
           / count(*) OVER w) * 100.0 + 0.5) / 100.0 AS nation_avg
  FROM customer WINDOW w AS (PARTITION BY c_nationkey))
WHERE c_acctbal::DECIMAL(18,2)::DOUBLE > nation_avg
ORDER BY c_custkey
"""


# -------------------------------------------------------- rollup / cube


def rollup_nation_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: order counts by (nation, status) with ROLLUP
    subtotals (SURVEY §2.4 notes these come free from Spark)."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("n_name", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.asc_nulls_first("n_name"), F.asc_nulls_first("o_orderstatus"))
    )


ROLLUP_SQL = """
SELECT n_name, o_orderstatus, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, o_orderstatus)
ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST
"""


# ------------------------------------------------------- distinct counting


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + approximate distinct (approx pinned only for exactness of
    the exact column; approx column is compared loosely via rows-only?
    No — both engines differ on approx, so only exact distincts here)."""
    l = load(spark, sf_dir, "lineitem")
    return l.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


DISTINCT_SQL = """
SELECT count(DISTINCT l_orderkey) AS n_orders,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps
FROM lineitem
"""


# ------------------------------------------------------------- word count


def top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency, top 20 — the canonical explode+count with
    deterministic tie-break."""
    d = load(spark, sf_dir, "documents")
    w = d.select(F.explode(CF.words("text")).alias("term"))
    return (
        w.groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(20)
    )


TOP_TERMS_SQL = f"""
SELECT term, count(*) AS freq FROM (
  SELECT unnest({CF.words_sql('text')}) AS term FROM documents)
GROUP BY term ORDER BY freq DESC, term LIMIT 20
"""


# ----------------------------------------------------------- event funnel


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes their first
    click, which precedes their first purchase — min-per-type pivot +
    ordering predicate."""
    e = load(spark, sf_dir, "events")
    firsts = (
        e.filter(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
        )
    )
    return (
        firsts.filter(
            F.col("first_view").isNotNull()
            & F.col("first_click").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_view") < F.col("first_click"))
            & (F.col("first_click") < F.col("first_purchase"))
        )
        .select("user_id", "first_view", "first_click", "first_purchase")
        .orderBy("user_id")
    )


EVENT_FUNNEL_SQL = """
SELECT user_id, first_view, first_click, first_purchase FROM (
  SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
    min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
    min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
  GROUP BY user_id)
WHERE first_view IS NOT NULL AND first_click IS NOT NULL AND first_purchase IS NOT NULL
  AND first_view < first_click AND first_click < first_purchase
ORDER BY user_id
"""


QUERIES: dict[str, Query] = {
    "q4_late_orders": Query(q4_late_orders, Q4_SQL),
    "q7_nation_trade": Query(q7_nation_trade, Q7_SQL),
    "above_avg_balance": Query(above_avg_balance, ABOVE_AVG_SQL),
    "q10_returned_items": Query(q10_returned_items, Q10_SQL, headline=True),
    "q14_promo_share": Query(q14_promo_share, Q14_SQL),
    "q18_large_orders": Query(q18_large_orders, Q18_SQL, headline=True),
    "rollup_nation_status": Query(rollup_nation_status, ROLLUP_SQL),
    "distinct_counts": Query(distinct_counts, DISTINCT_SQL),
    "top_terms": Query(top_terms, TOP_TERMS_SQL),
    "event_funnel": Query(event_funnel, EVENT_FUNNEL_SQL),
}
