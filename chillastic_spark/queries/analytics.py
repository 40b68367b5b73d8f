"""Analytics batch 3: TF-IDF, pivot matrices, skew diagnostics, and the
Pandas GROUPED_AGG UDAF surface (SURVEY §2.10: "UDAF — Spark pandas_udf
GROUPED_AGG if needed")."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chillastic_spark import functions as CF
from chillastic_spark.queries import Query
from chillastic_spark.tables import load

_W = CF.words_sql("text")


# ------------------------------------------------------------------ TF-IDF


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: tf·ln(N/df), ranked by the
    rounded score with term tie-break. Two shuffles (doc-term counts,
    df counts); the df table is tiny → broadcast. N rides an in-plan
    1-row broadcast aggregate (bm25_topk stats pattern) — no separate
    driver count() job."""
    d = load(spark, sf_dir, "documents")
    stats = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    terms = d.select(
        "doc_id", F.explode(CF.words("text")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df from tf, not terms.distinct(): tf already holds one row per
    # (doc, term), so this reuses tf's exchange (ReusedExchange in the
    # plan) instead of re-shuffling the whole exploded corpus
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "score",
            CF.round_det(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "score", F.col("rk").alias("rank"))
    )


TFIDF_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest({_W}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
), df_t AS (
  SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, term,
         floor((tf * ln(CAST(n_docs AS DOUBLE) / df)) * 10000.0 + 0.5) / 10000.0 AS score
  FROM tf JOIN df_t USING (term), n
)
SELECT doc_id, term, score,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rank
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) <= 3
"""


# ------------------------------------------------------------------- pivot


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × event-type count matrix via DataFrame pivot."""
    e = load(spark, sf_dir, "events")
    return (
        e.withColumn("hour_of_day", F.hour("ts"))
        .groupBy("hour_of_day")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
        .orderBy("hour_of_day")
    )


EVENTS_PIVOT_SQL = f"""
SELECT CAST(hour(ts) AS INT) AS hour_of_day,
  {", ".join(f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT AS {t}" for t in EVENT_TYPES)}
FROM events GROUP BY 1 ORDER BY 1
"""


# -------------------------------------------------------- skew diagnostics


def skew_top_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.skew.top_keys on the lineitem join key — the diagnostic
    run before choosing a salting strategy."""
    from chillastic_spark.operators.skew import top_keys

    l = load(spark, sf_dir, "lineitem")
    return top_keys(l, "l_suppkey", k=10)


SKEW_TOP_KEYS_SQL = """
SELECT l_suppkey, count(*) AS freq FROM lineitem
GROUP BY l_suppkey ORDER BY freq DESC, l_suppkey LIMIT 10
"""


# ------------------------------------------- Pandas GROUPED_AGG UDAF surface


def geomean_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of |value| per event_type via a Pandas GROUPED_AGG
    UDAF (Arrow-batched; the §2.10 UDAF box). The UDAF computes
    exp(mean(ln x)) in numpy; the oracle is the same identity in SQL."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    def _geomean(v):
        import numpy as np

        # sum ROUNDED micro-units as int64 (exact, order-independent)
        # rather than np.mean over raw doubles: pairwise float
        # accumulation depends on row order, which shuffle fetch does
        # not fix — the oracle sums the identical integer terms
        units = np.floor(np.log(np.abs(v) + 1.0) * 1e6 + 0.5).astype("int64")
        return float(np.exp(units.sum() / 1e6 / len(v)))

    # module uses `from __future__ import annotations` (string hints),
    # which pandas_udf can't inspect — set real annotations explicitly
    _geomean.__annotations__ = {"v": pd.Series, "return": float}
    geomean = pandas_udf(_geomean, "double")

    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(CF.round_det(geomean("value"), 4).alias("geomean_value"))
        .orderBy("event_type")
    )


GEOMEAN_SQL = """
SELECT event_type,
       floor((exp((sum(floor(ln(abs(value) + 1.0) * 1000000.0 + 0.5)::BIGINT)::DOUBLE / 1000000.0) / count(*)))
             * 10000.0 + 0.5) / 10000.0 AS geomean_value
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES: dict[str, Query] = {
    "tfidf_top_terms": Query(tfidf_top_terms, TFIDF_SQL, headline=True),
    "events_pivot": Query(events_pivot, EVENTS_PIVOT_SQL),
    "skew_top_keys": Query(skew_top_keys, SKEW_TOP_KEYS_SQL),
    "geomean_value_by_type": Query(geomean_value_by_type, GEOMEAN_SQL),
}
