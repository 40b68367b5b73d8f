"""Batch 14 — winsorized robust statistics and sequential path mining.

Scale notes: winsorize shares ONE event_type window shuffle between
the two percentile ranks and reuses it for the final agg; thresholds
are a 5-row broadcast. Paths are one user_id window shuffle with
map-side-combined counting and a TakeOrderedAndProject top-k.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chillastic_spark import functions as CF
from chillastic_spark.operators.topk import ranked_topk
from chillastic_spark.queries import Query
from chillastic_spark.tables import load

# --------------------------------------------------- winsorized stats

_P_LO, _P_HI = 0.10, 0.90


def value_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of `value` per event_type: clip to the exact
    interpolated [p10, p90] (percentile_cont semantics, the explicit
    ≤2-summand interpolation of `value_percentiles`), then average the
    clipped values through DECIMAL — the robust-stats preprocessing
    step (outliers saturate instead of dominating)."""
    e = load(spark, sf_dir, "events")
    wr = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = (
        e.select("event_type", "event_id", "value")
        .withColumn("rn", F.row_number().over(wr))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    cells = [
        F.sum(CF.pct_cell(F.col("value"), F.col("rn"), F.col("n"), p)).alias(name)
        for name, p in (("lo", _P_LO), ("hi", _P_HI))
    ]
    thresholds = r.groupBy("event_type").agg(*cells)

    clipped = (
        e.select("event_type", "value")
        .join(F.broadcast(thresholds), "event_type")
        .select(
            "event_type",
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("cv"),
            (F.col("value") < F.col("lo")).cast("long").alias("clip_lo"),
            (F.col("value") > F.col("hi")).cast("long").alias("clip_hi"),
        )
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("clip_lo").alias("n_clipped_lo"),
        F.sum("clip_hi").alias("n_clipped_hi"),
        CF.round_det(
            F.sum(F.col("cv").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("winsorized_mean"),
    )


WINSORIZED_SQL = f"""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
t AS (
  SELECT event_type,
    sum({CF.pct_cell_sql("value", _P_LO)}) AS lo,
    sum({CF.pct_cell_sql("value", _P_HI)}) AS hi
  FROM r GROUP BY event_type)
SELECT e.event_type, count(*) AS n,
       sum(CASE WHEN value < lo THEN 1 ELSE 0 END)::BIGINT AS n_clipped_lo,
       sum(CASE WHEN value > hi THEN 1 ELSE 0 END)::BIGINT AS n_clipped_hi,
       {CF.round_det_sql("sum(least(greatest(value, lo), hi)::DECIMAL(18,6))::DOUBLE / count(*)", 6)} AS winsorized_mean
FROM events e JOIN t ON e.event_type = t.event_type
GROUP BY e.event_type
"""


# ------------------------------------------------------ top event paths

_PATH_K = 15


def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 three-step behavioural paths (e1>e2>e3 over consecutive
    events per user) — the sequential-pattern rollup behind funnel
    design. One user window shuffle; counting is map-side combined;
    top-k is TakeOrderedAndProject."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = e.select(
        F.concat_ws(
            ">",
            F.col("event_type"),
            F.lead("event_type", 1).over(w),
            F.lead("event_type", 2).over(w),
        ).alias("path"),
        F.lead("event_type", 2).over(w).alias("third"),
    ).filter(F.col("third").isNotNull())
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(_PATH_K)
    )


TOP_PATHS_SQL = f"""
WITH s AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
FROM s WHERE e3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path ASC LIMIT {_PATH_K}
"""


# ------------------------------------------------------ more-like-this

_MLT_SRC = 0  # source document
_MLT_TERMS = 10  # interesting terms taken from the source
_MLT_K = 10


def more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `more_like_this`: pick the source doc's 10 most interesting
    terms (highest tf·idf), then rank other docs by the summed idf of
    the interesting terms they share. Everything derives in-plan (no
    driver collect): interesting terms are a 10-row broadcast, the
    candidate score sums ≤10 rounded-DECIMAL summands (order-free),
    ties break on doc_id."""
    from chillastic_spark.persist import materialize
    from chillastic_spark.queries.documents import _W  # noqa: F401  (SQL twin)

    d = load(spark, sf_dir, "documents")
    # three consumers (dfreq, source-doc terms, candidate scoring):
    # materialize so the tokenize+explode+agg pipeline runs once
    posts = materialize(
        d.select("doc_id", F.explode(CF.words("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    dfreq = posts.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(F.col("n_docs") / F.col("df"))

    src = (
        posts.filter(F.col("doc_id") == _MLT_SRC)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .select("term", CF.round_det(F.col("tf") * idf, 6).alias("w"), "df", "n_docs")
    )
    # window-free top-terms selection: the input is one document's
    # vocabulary so a global window would not be a true scale hazard,
    # but ranked_topk keeps every ranking in the repo WindowExec-free
    # (tests/test_plan_shapes.py pins it)
    top_terms = ranked_topk(src.select("term", "w"), "w", "term", _MLT_TERMS)
    interesting = src.join(
        F.broadcast(top_terms.select("term")), "term"
    ).select("term", CF.round_det(idf, 9).alias("tidf"))
    scored = (
        posts.filter(F.col("doc_id") != _MLT_SRC)
        .join(F.broadcast(interesting), "term")
        .groupBy("doc_id")
        .agg(
            CF.round_det(
                F.sum(F.col("tidf").cast("decimal(18,9)")).cast("double"), 6
            ).alias("mlt_score"),
            F.count(F.lit(1)).alias("n_shared_terms"),
        )
    )
    return scored.orderBy(F.desc("mlt_score"), F.asc("doc_id")).limit(_MLT_K)


def _mlt_sql() -> str:
    from chillastic_spark.queries.documents import _W

    return f"""
WITH posts AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest({_W}) AS term FROM documents)
  GROUP BY doc_id, term),
nd AS (SELECT count(*) AS n_docs FROM documents),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM posts GROUP BY term),
src AS (
  SELECT posts.term,
         {CF.round_det_sql("tf * ln(n_docs::DOUBLE / df)", 6)} AS w, df
  FROM posts JOIN dfreq ON posts.term = dfreq.term CROSS JOIN nd
  WHERE doc_id = {_MLT_SRC}),
interesting AS (
  SELECT term, ({CF.round_det_sql("ln(n_docs::DOUBLE / df)", 9)}) AS tidf
  FROM src CROSS JOIN nd
  QUALIFY row_number() OVER (ORDER BY w DESC, term) <= {_MLT_TERMS})
SELECT doc_id,
       {CF.round_det_sql("sum(tidf::DECIMAL(18,9))::DOUBLE", 6)} AS mlt_score,
       count(*) AS n_shared_terms
FROM posts JOIN interesting USING (term)
WHERE doc_id != {_MLT_SRC}
GROUP BY doc_id
ORDER BY mlt_score DESC, doc_id ASC LIMIT {_MLT_K}
"""


MLT_SQL = _mlt_sql()


QUERIES: dict[str, Query] = {
    "value_winsorized_stats": Query(value_winsorized_stats, WINSORIZED_SQL),
    "top_event_paths": Query(top_event_paths, TOP_PATHS_SQL),
    "more_like_this": Query(more_like_this, MLT_SQL),
}
