"""Analytics batch 4: OR-ed predicate pushdown (TPC-H Q19 flavour),
z-score outlier detection, corpus-level source similarity."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chillastic_spark import functions as CF
from chillastic_spark.queries import Query
from chillastic_spark.tables import load

_W = CF.words_sql("text")


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
            # clamp the variance at 0: catastrophic cancellation can
            # push E[x²]−E[x]² a few ulps negative for a near-constant
            # group, and sqrt(negative) is NaN here but a HARD ERROR in
            # the DuckDB oracle — clamped, both engines get sd=0 and
            # the sd>0 filter below drops the group on both sides
            F.sqrt(
                F.greatest(
                    F.col("s2").cast("double") / F.col("n")
                    - (F.col("s1").cast("double") / F.col("n"))
                    * (F.col("s1").cast("double") / F.col("n")),
                    F.lit(0.0),
                )
            ).alias("sd"),
        )
    )
    return (
        # sd == 0 (constant-valued or single-row group) → z is
        # undefined and the group has no outliers; under ANSI mode the
        # bare division would FAIL the whole job on such a group. The
        # oracle carries the same `WHERE sd > 0` so both engines skip
        # identical groups (NaN/0-division semantics differ per engine
        # and even per DuckDB version — never rely on them).
        e.join(F.broadcast(stats.filter(F.col("sd") > 0)), "event_type")
        .withColumn("z", CF.round_det((F.col("value") - F.col("mean")) / F.col("sd"), 2))
        .filter((F.col("z") >= 2.0) | (F.col("z") <= -2.0))
        .select("event_id", "event_type", "z")
    )


VALUE_OUTLIERS_SQL = """
WITH stats AS (
  SELECT event_type,
         sum(value::DECIMAL(18,6))::DOUBLE / count(*) AS mean,
         sqrt(greatest(
           sum((value::DECIMAL(18,6) * value::DECIMAL(18,6))::DECIMAL(38,12))::DOUBLE / count(*)
              - (sum(value::DECIMAL(18,6))::DOUBLE / count(*)) * (sum(value::DECIMAL(18,6))::DOUBLE / count(*)),
           0.0)) AS sd
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type,
       floor(((value - mean) / sd) * 100.0 + 0.5) / 100.0 AS z
FROM events e JOIN stats USING (event_type)
WHERE sd > 0
  AND (floor(((value - mean) / sd) * 100.0 + 0.5) / 100.0 >= 2.0
    OR floor(((value - mean) / sd) * 100.0 + 0.5) / 100.0 <= -2.0)
"""


# ------------------------------------------------------ source similarity


def source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard between source shards: which corpus slices
    cover the same vocabulary — the inverted-index join at the
    (source, term) granularity."""
    d = load(spark, sf_dir, "documents")
    vocab = d.select(
        "source", F.explode(CF.words("text")).alias("term")
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


SOURCE_SIMILARITY_SQL = f"""
WITH vocab AS (
  SELECT DISTINCT source, unnest({_W}) AS term
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


# ------------------------------------------------- rolling window stats


def rolling_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event stream windows: lag delta, lead peek, and a
    3-event moving average. The moving avg is built from explicit lags
    (value + lag1 + lag2) / k rather than an engine AVG frame, so the
    float accumulation order is identical on both engines."""
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag1 = F.lag("value", 1).over(w)
    lag2 = F.lag("value", 2).over(w)
    k = (
        F.lit(1)
        + F.when(lag1.isNotNull(), 1).otherwise(0)
        + F.when(lag2.isNotNull(), 1).otherwise(0)
    )
    return e.select(
        "user_id",
        "event_id",
        CF.round_det(F.col("value") - lag1, 4).alias("delta_prev"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        CF.round_det(
            (F.col("value") + F.coalesce(lag1, F.lit(0.0)) + F.coalesce(lag2, F.lit(0.0)))
            / k,
            4,
        ).alias("mov_avg3"),
    )


ROLLING_SQL = """
SELECT user_id, event_id,
  floor((value - lag(value, 1) OVER w) * 10000.0 + 0.5) / 10000.0 AS delta_prev,
  lead(event_type, 1) OVER w AS next_type,
  floor(((value + coalesce(lag(value, 1) OVER w, 0.0) + coalesce(lag(value, 2) OVER w, 0.0))
         / (1 + CASE WHEN lag(value, 1) OVER w IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN lag(value, 2) OVER w IS NOT NULL THEN 1 ELSE 0 END)) * 10000.0 + 0.5) / 10000.0 AS mov_avg3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------- deterministic median


def median_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median of value per event type, computed from the middle
    row(s) explicitly (row_number + count, average of the two middle
    elements) — engine percentile implementations interpolate in
    different float orders; (a+b)/2 over the same two rows cannot."""
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    mid = (
        e.withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(
            (F.col("rk") == F.floor((F.col("n") + 1) / F.lit(2)))
            | (F.col("rk") == F.floor((F.col("n") + 2) / F.lit(2)))
        )
    )
    return (
        mid.groupBy("event_type")
        .agg(
            CF.round_det(F.sum("value") / F.count(F.lit(1)), 6).alias("median_value"),
            F.max("n").alias("n_events"),
        )
        .orderBy("event_type")
    )


MEDIAN_SQL = """
WITH ranked AS (
  SELECT event_type, value, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       floor((sum(value) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS median_value,
       max(n) AS n_events
FROM ranked
WHERE rk = floor((n + 1) / 2) OR rk = floor((n + 2) / 2)
GROUP BY event_type
ORDER BY event_type
"""


# ----------------------------------------------------------- sketches
# Approximate-by-design (HLL++ / GK quantiles) → rows-only checks;
# error bounds pinned by tests/test_sketches.py.


def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type — the 100 TB
    COUNT(DISTINCT): one pass, fixed 1.5 KB sketch per group, no
    distinct-shuffle. rsd=0.01 ⇒ ~1% standard error."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
        .orderBy("event_type")
    )


def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles of value per event type —
    bounded-memory percentiles (accuracy 1/10000), mergeable across
    partitions."""
    e = load(spark, sf_dir, "events")
    q = F.percentile_approx("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9)), 10000)
    return (
        e.groupBy("event_type")
        .agg(
            q.getItem(0).alias("p25"),
            q.getItem(1).alias("p50"),
            q.getItem(2).alias("p90"),
        )
        .orderBy("event_type")
    )


QUERIES: dict[str, Query] = {
    "q19_discounted_revenue": Query(q19_discounted_revenue, Q19_SQL),
    "value_outliers": Query(value_outliers, VALUE_OUTLIERS_SQL),
    "source_similarity": Query(source_similarity, SOURCE_SIMILARITY_SQL),
    "rolling_event_stats": Query(rolling_event_stats, ROLLING_SQL),
    "median_value_by_type": Query(median_value_by_type, MEDIAN_SQL),
    "sketch_distinct_users": Query(sketch_distinct_users, None),
    "sketch_value_quantiles": Query(sketch_value_quantiles, None),
}
