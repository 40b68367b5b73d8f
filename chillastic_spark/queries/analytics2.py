"""Analytics batch 4: OR-ed predicate pushdown (TPC-H Q19 flavour),
z-score outlier detection, corpus-level source similarity."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chillastic_spark import functions as CF
from chillastic_spark.queries import Query
from chillastic_spark.tables import load

_W = r"regexp_split_to_array(trim(text), '\s+')"


def _dec(col: str, prec: int, scale: int):
    return F.col(col).cast(f"decimal({prec},{scale})")


# ------------------------------------------------------------ q19 flavour


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 flavour: revenue from OR-ed (brand, size, quantity)
    predicate groups — Catalyst pushes the disjunction into both scans."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    ep = _dec("l_extendedprice", 14, 2)
    disc = _dec("l_discount", 4, 2)
    one = F.lit(1).cast("decimal(3,2)")
    joined = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40))
    )
    return joined.filter(cond).agg(
        F.round(F.sum(ep * (one - disc)), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_SQL = """
SELECT
  round(sum(l_extendedprice::DECIMAL(14,2) * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS revenue,
  count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity BETWEEN 20 AND 40)
"""


# -------------------------------------------------------- z-score outliers


def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates >2σ from their type's mean — the
    z-score anomaly primitive. Mean/σ from exact decimal sums so both
    engines derive identical doubles (σ via the E[x²]−E[x]² identity
    written out explicitly, not engine stddev whose accumulation order
    differs)."""
    e = load(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    stats = (
        e.groupBy("event_type")
        .agg(
            F.sum(v).alias("s1"),
            F.sum((v * v).cast("decimal(38,12)")).alias("s2"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            (F.col("s1").cast("double") / F.col("n")).alias("mean"),
            F.sqrt(
                F.col("s2").cast("double") / F.col("n")
                - (F.col("s1").cast("double") / F.col("n"))
                * (F.col("s1").cast("double") / F.col("n"))
            ).alias("sd"),
        )
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .withColumn("z", CF.round_det((F.col("value") - F.col("mean")) / F.col("sd"), 2))
        .filter((F.col("z") >= 2.0) | (F.col("z") <= -2.0))
        .select("event_id", "event_type", "z")
    )


VALUE_OUTLIERS_SQL = """
WITH stats AS (
  SELECT event_type,
         sum(value::DECIMAL(18,6))::DOUBLE / count(*) AS mean,
         sqrt(sum((value::DECIMAL(18,6) * value::DECIMAL(18,6))::DECIMAL(38,12))::DOUBLE / count(*)
              - (sum(value::DECIMAL(18,6))::DOUBLE / count(*)) * (sum(value::DECIMAL(18,6))::DOUBLE / count(*))) AS sd
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type,
       floor(((value - mean) / sd) * 100.0 + 0.5) / 100.0 AS z
FROM events e JOIN stats USING (event_type)
WHERE floor(((value - mean) / sd) * 100.0 + 0.5) / 100.0 >= 2.0
   OR floor(((value - mean) / sd) * 100.0 + 0.5) / 100.0 <= -2.0
"""


# ------------------------------------------------------ source similarity


def source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard between source shards: which corpus slices
    cover the same vocabulary — the inverted-index join at the
    (source, term) granularity."""
    d = load(spark, sf_dir, "documents")
    vocab = d.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    ).distinct()
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    a, b = vocab.alias("a"), vocab.alias("b")
    common = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "src_a").join(sb, "src_b")
        .select(
            "src_a", "src_b",
            CF.round_det(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 4
            ).alias("vocab_jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


SOURCE_SIMILARITY_SQL = """
WITH vocab AS (
  SELECT DISTINCT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents
), sz AS (
  SELECT source, count(*) AS sz FROM vocab GROUP BY source
), c AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS common
  FROM vocab a JOIN vocab b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b,
       floor((common / (sa.sz + sb.sz - common)) * 10000.0 + 0.5) / 10000.0 AS vocab_jaccard
FROM c JOIN sz sa ON c.src_a = sa.source JOIN sz sb ON c.src_b = sb.source
ORDER BY src_a, src_b
"""


QUERIES: dict[str, Query] = {
    "q19_discounted_revenue": Query(q19_discounted_revenue, Q19_SQL),
    "value_outliers": Query(value_outliers, VALUE_OUTLIERS_SQL),
    "source_similarity": Query(source_similarity, SOURCE_SIMILARITY_SQL),
}
