"""Batch 10 — sequence packing, quality percentile gating, hypertable
time-weighted averages, OHLC candlesticks, and the heavy-hitter
frequency sketch.

Scale notes:
* sequence packing is ONE shuffle on lang (window cumsum) followed by
  a map-side-combined agg on the same key — the manifest is |langs|
  rows regardless of corpus size, and every figure is BIGINT-exact;
* the quality gate reuses the packing's shuffle shape (percent_rank
  over lang) — ordering is by the ROUNDED score + doc_id so the rank
  is engine-independent;
* time-weighted avg / OHLC each use one window shuffle whose
  partitioning is reused by the following groupBy (no second
  Exchange); products go through DECIMAL so the sums are exact;
* heavy hitters moves O(partitions × capacity) counter rows instead of
  O(total tokens) — the sketch twin of `top_terms` (rows-only entry;
  the MG bound is pinned by tests/test_analytics6.py).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chillastic_spark import functions as CF
from chillastic_spark.operators import sketches as SK
from chillastic_spark.operators import text as T
from chillastic_spark.queries import Query
from chillastic_spark.queries.documents import _W, _WF, QUALITY_EXPR_SQL
from chillastic_spark.tables import load

# ------------------------------------------------- sequence packing

_PACK_BUDGET = 2048


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing manifest: concatenate each language's
    docs in doc_id order and cut at a fixed token budget (the GPT-style
    pack-and-chunk loader). Reports, per lang, how many packs the
    corpus fills and how many docs straddle a pack boundary.

    Deterministic contract: pack of a token = floor(global_offset /
    budget); a doc spans a boundary iff its first and last token land
    in different packs. Everything is BIGINT arithmetic on a window
    cumsum — reproducible on any engine / cluster size.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("lang", "doc_id", F.size(CF.words("text")).alias("n_tok"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    b = F.lit(_PACK_BUDGET)
    spans = (excl / b).cast("long") != ((excl + F.col("n_tok") - 1) / b).cast("long")
    return (
        toks.withColumn("spans", spans)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            (((F.sum("n_tok") - 1) / b).cast("long") + 1).alias("n_packs"),
            F.sum(F.col("spans").cast("long")).alias("n_spanning"),
            F.max("n_tok").alias("max_doc_tokens"),
        )
    )


SEQUENCE_PACKING_SQL = f"""
WITH t AS (
  SELECT lang, doc_id, len({_W}) AS n_tok FROM documents),
c AS (
  SELECT lang, n_tok,
         coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
  FROM t)
SELECT lang, count(*) AS n_docs, sum(n_tok)::BIGINT AS total_tokens,
       ((sum(n_tok) - 1) // {_PACK_BUDGET} + 1)::BIGINT AS n_packs,
       sum(CASE WHEN excl // {_PACK_BUDGET}
                  != (excl + n_tok - 1) // {_PACK_BUDGET} THEN 1 ELSE 0 END)::BIGINT AS n_spanning,
       max(n_tok) AS max_doc_tokens
FROM c GROUP BY lang
"""


# -------------------------------------------- quality percentile gate

_GATE_TOP = 0.30  # keep the top 30% of each language by quality


def quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language relative quality gate: keep each language's top 30%
    by quality score (the percentile-threshold curation pattern —
    absolute thresholds misfire across languages, relative ones don't).

    Rank orders by the ROUNDED score with doc_id tie-break, so
    percent_rank = (row_number-1)/(n-1) is the identical double on both
    engines.
    """
    d = load(spark, sf_dir, "documents")
    # empty-filtered: quality_score's w contract (operators.text._w)
    w = F.array_remove(CF.words("text"), "")
    scored = d.select(
        "lang",
        "doc_id",
        CF.round_det(T.quality_score("text", w=w), 4).alias("q"),
        F.size(w).alias("n_tok"),
    )
    ws = Window.partitionBy("lang").orderBy(F.desc("q"), F.asc("doc_id"))
    return (
        scored.withColumn("pr", F.percent_rank().over(ws))
        .filter(F.col("pr") <= F.lit(_GATE_TOP))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("q").alias("q_threshold"),
            F.sum("n_tok").alias("tokens_kept"),
        )
    )


QUALITY_GATE_SQL = f"""
WITH s AS (
  SELECT lang, doc_id, {QUALITY_EXPR_SQL} AS q, len({_WF}) AS n_tok
  FROM documents),
r AS (
  SELECT lang, q, n_tok,
         percent_rank() OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS pr
  FROM s)
SELECT lang, count(*) AS n_kept, min(q) AS q_threshold, sum(n_tok)::BIGINT AS tokens_kept
FROM r WHERE pr <= {_GATE_TOP} GROUP BY lang
"""


# ---------------------------------------------- time-weighted average

def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable time-weighted mean of `value` per event_type (LOCF
    weighting: each observation holds until the next one, timescale's
    time_weight('LOCF') analog). Irregularly-sampled series make the
    plain AVG lie; this weights by holding time.

    Exactness: dt is BIGINT micros, value goes through DECIMAL(18,6),
    so both sums are exact; only the final division is float (identical
    expression both sides). One window shuffle on event_type, reused by
    the groupBy.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # ts reads as TIMESTAMP_NTZ; unix_micros requires TIMESTAMP. The cast
    # is an identity reinterpretation under the UTC session timezone.
    ts = F.col("ts").cast("timestamp")
    dt_us = F.unix_micros(F.lead(ts).over(w)) - F.unix_micros(ts)
    r = e.select(
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
        dt_us.alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        (F.sum("dt_us") / F.lit(1000000)).cast("long").alias("span_sec"),
        CF.round_det(
            F.sum(F.col("v") * F.col("dt_us")).cast("double")
            / F.sum("dt_us").cast("double"),
            6,
        ).alias("twa_value"),
    )


TIME_WEIGHTED_SQL = f"""
WITH d AS (
  SELECT event_type, value::DECIMAL(18,6) AS v,
         epoch_us(lead(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id)::TIMESTAMP)
           - epoch_us(ts::TIMESTAMP) AS dt_us
  FROM events)
SELECT event_type, count(*) AS n_intervals,
       (sum(dt_us) // 1000000)::BIGINT AS span_sec,
       {CF.round_det_sql("sum(v * dt_us)::DOUBLE / sum(dt_us)::DOUBLE", 6)} AS twa_value
FROM d WHERE dt_us IS NOT NULL GROUP BY event_type
"""


# --------------------------------------------------- OHLC candlesticks

def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC (open/high/low/close) candlesticks of `value` per
    event_type — the finance-rollup classic over a hypertable.

    First/last are picked by row_number over ONE sort (rn==1 / rn==n,
    (ts, event_id) total order); open/high/low/close pass raw doubles
    through untouched so no float arithmetic can diverge. The window's
    hash partitioning on (event_type, day) is reused by the groupBy —
    one Exchange total.
    """
    e = load(spark, sf_dir, "events")
    # day as STRING: duckdb DATE surfaces as datetime64 midnight in
    # pandas while Spark DATE is datetime.date — strings hash equal.
    d = e.select(
        "event_type",
        F.to_date("ts").cast("string").alias("day"),
        "ts",
        "event_id",
        "value",
    )
    wp = Window.partitionBy("event_type", "day")
    w = wp.orderBy("ts", "event_id")
    r = d.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wp)
    )
    return r.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        CF.round_det(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias(
            "volume"
        ),
    )


EVENTS_OHLC_SQL = f"""
WITH d AS (
  SELECT event_type, ts::DATE::VARCHAR AS day, ts, event_id, value FROM events),
r AS (
  SELECT *, row_number() OVER w AS rn, count(*) OVER (PARTITION BY event_type, day) AS n
  FROM d WINDOW w AS (PARTITION BY event_type, day ORDER BY ts, event_id))
SELECT event_type, day,
       max(CASE WHEN rn = 1 THEN value END) AS open,
       max(value) AS high, min(value) AS low,
       max(CASE WHEN rn = n THEN value END) AS close,
       count(*) AS n_events,
       {CF.round_det_sql("sum(value::DECIMAL(18,6))::DOUBLE", 6)} AS volume
FROM r GROUP BY event_type, day
"""


# ------------------------------------------------ heavy-hitter sketch

def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-20 corpus tokens via the mergeable Misra-Gries
    sketch (operators/sketches.py) — bounded-memory twin of
    `top_terms`. Rows-only entry: est depends on partition layout (the
    bound est ≤ true ≤ est+err is what's guaranteed; pinned by
    tests/test_analytics6.py)."""
    d = load(spark, sf_dir, "documents")
    return SK.heavy_hitter_tokens(d, capacity=256, k=20)


QUERIES: dict[str, Query] = {
    "sequence_packing": Query(sequence_packing, SEQUENCE_PACKING_SQL),
    "quality_percentile_gate": Query(quality_percentile_gate, QUALITY_GATE_SQL),
    "time_weighted_avg": Query(time_weighted_avg, TIME_WEIGHTED_SQL),
    "events_ohlc": Query(events_ohlc, EVENTS_OHLC_SQL),
    "heavy_hitter_terms": Query(heavy_hitter_terms, None),
}
