"""Engine-parity queries: each pins one operator from SURVEY §2 on the
testdata, treating `documents` as the document store (`source` ≈ _index,
`lang` ≈ _type, `n_chars` ≈ _size) and `events` as the stream table.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chillastic_spark import functions as CF
from chillastic_spark.queries import Query
from chillastic_spark.tables import load

# ------------------------------------------------- S1/P8: scan + pushdown


def scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scroll-scan analog (SURVEY S1, transfer.js:103-151): projected,
    range-bounded read of one slice. Projection + range predicate reach
    the parquet scan (ReadSchema/PushedFilters)."""
    d = load(spark, sf_dir, "documents")
    return d.filter((F.col("n_chars") >= 100) & (F.col("n_chars") < 400)).select(
        "doc_id", "lang", "n_chars"
    )


SCAN_PROJECTION_SQL = """
SELECT doc_id, lang, n_chars FROM documents WHERE n_chars >= 100 AND n_chars < 400
"""


# ------------------------------------------------------ A1: count per slice


def count_per_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtask count query (SURVEY A1, subtasks.js:97-100): docs per
    (index,type) slice."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))


COUNT_PER_SLICE_SQL = """
SELECT source, lang, count(*) AS cnt FROM documents GROUP BY source, lang
"""


# -------------------------------------------------------- A2: stats on size


def size_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """initialBounds stats agg (SURVEY A2, subtasks.js:210-237):
    min/max/count of the size field per index."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.min("n_chars").alias("min_size"),
        F.max("n_chars").alias("max_size"),
        F.count(F.lit(1)).alias("cnt"),
    )


SIZE_STATS_SQL = """
SELECT source, min(n_chars) AS min_size, max(n_chars) AS max_size, count(*) AS cnt
FROM documents GROUP BY source
"""


# --------------------------------------------------- A3: 3-bucket histogram


def size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """calculateBounds 3-bucket range histogram (SURVEY A3,
    subtasks.js:238-351): doc counts per size range."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.when(F.col("n_chars") < 200, F.lit("b0_small"))
        .when(F.col("n_chars") < 400, F.lit("b1_medium"))
        .otherwise(F.lit("b2_large"))
    )
    return (
        d.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("bucket")
    )


SIZE_HISTOGRAM_SQL = """
SELECT CASE WHEN n_chars < 200 THEN 'b0_small'
            WHEN n_chars < 400 THEN 'b1_medium'
            ELSE 'b2_large' END AS bucket,
       count(*) AS doc_count
FROM documents GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------- A4: backlog totals


def backlog_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tallyCounts (SURVEY A4, subtasks.js:410-428): total backlog =
    sum of per-slice counts, plus slice count."""
    d = load(spark, sf_dir, "documents")
    slices = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    return slices.agg(
        F.sum("cnt").alias("total_docs"), F.count(F.lit(1)).alias("n_slices")
    )


BACKLOG_TOTALS_SQL = """
SELECT sum(cnt)::BIGINT AS total_docs, count(*) AS n_slices
FROM (SELECT source, lang, count(*) AS cnt FROM documents GROUP BY source, lang)
"""


# ------------------------------------------------------- O4: resume anti-join


def resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unfinished = potential − completed (SURVEY O4,
    subtasks.js:385-392): potential work (customers) minus completed
    (those with an urgent order), via left_anti."""
    c = load(spark, sf_dir, "customer")
    done = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(
        done, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


RESUME_ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


# -------------------------------------------------------- O5: dedup enqueue


def distinct_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-enqueue guard (SURVEY O5, subtasks.js:51-67): distinct
    subtask keys."""
    d = load(spark, sf_dir, "documents")
    return d.select("source", "lang").distinct()


DISTINCT_SLICES_SQL = """
SELECT DISTINCT source, lang FROM documents
"""


# --------------------------------------------------------- O7: backlog union


def backlog_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of subtask generators (SURVEY O7, subtasks.js:375-379):
    index-level work ∪ per-(index,type) document work."""
    d = load(spark, sf_dir, "documents")
    idx = d.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).select(
        F.lit("index").alias("kind"), F.col("source").alias("name"), "cnt"
    )
    docs = (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.lit("documents").alias("kind"),
            F.concat_ws("/", "source", "lang").alias("name"),
            "cnt",
        )
    )
    return idx.unionByName(docs)


BACKLOG_UNION_SQL = """
SELECT 'index' AS kind, source AS name, count(*) AS cnt FROM documents GROUP BY source
UNION ALL
SELECT 'documents' AS kind, source || '/' || lang AS name, count(*) AS cnt
FROM documents GROUP BY source, lang
"""


# ------------------------------------------------- §2.5: window / latest-doc


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-version-per-id dedup (SURVEY §2.5): row_number over
    (partition user order ts desc) = 1."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "event_id", "event_type")
    )


LATEST_EVENT_SQL = """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
  FROM events) WHERE rk = 1
"""


# ---------------------------------------------- P5: reroute (index renaming)


def reroute_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-bucketing index reroute (SURVEY P5, examples/mutators/
    indexDate.js): _index := 'events_' + yyyy-MM, doc count per target
    index — the partitioned-write fan-out plan."""
    e = load(spark, sf_dir, "events")
    return (
        e.withColumn("_index", F.concat(F.lit("events_"), F.date_format("ts", "yyyy-MM")))
        .groupBy("_index")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("_index")
    )


REROUTE_SQL = """
SELECT 'events_' || strftime(ts, '%Y-%m') AS _index, count(*) AS cnt
FROM events GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------- P1/P2: mutator chain semantics


def mutate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutator-chain fold (SURVEY P1, transfer.js:271-284): mutator 1
    (predicate lang='en' → rewrite text), mutator 2 (predicate
    n_chars<100 → drop). Non-matching docs pass through unmutated;
    null-mutate drops the row. Output fingerprints the mutated doc."""
    d = load(spark, sf_dir, "documents")
    mutated = F.when(
        F.col("lang") == "en", F.regexp_replace(F.col("text"), "spark", "SPARK")
    ).otherwise(F.col("text"))
    return (
        d.filter(~(F.col("n_chars") < 100))
        .select("doc_id", F.md5(mutated).alias("mutated_fp"))
    )


MUTATE_PIPELINE_SQL = """
SELECT doc_id,
  md5(CASE WHEN lang = 'en' THEN regexp_replace(text, 'spark', 'SPARK', 'g') ELSE text END) AS mutated_fp
FROM documents WHERE NOT (n_chars < 100)
"""


# ---------------------------------------------------- streaming-ish: events


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window agg (batch twin of the streaming operator in
    chillastic_spark.streaming): hourly counts + value sums."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2).cast("double").alias(
                "sum_value"
            ),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS cnt,
  round(sum(value::DECIMAL(18,6)), 2)::DOUBLE AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap): lag window + cumulative
    new-session flags → sessions/events per user."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_s",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_s").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


SESSIONIZE_SQL = """
SELECT user_id, sum(new_s)::BIGINT AS n_sessions, count(*) AS n_events FROM (
  SELECT user_id,
    CASE WHEN lag(ts) OVER w IS NULL OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
         THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
GROUP BY user_id
"""


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions via Spark's NATIVE session_window (gap-merge
    windows) — the declarative twin of the lag-flag ``sessionize``.

    session_window semantics: an event extends the session while its
    time is strictly BEFORE the current end (= last ts + gap), so a new
    session starts at ts ≥ prev + gap — the oracle's flag uses ≥ to
    match exactly. Output: one row per session with start, end
    (last + gap), and event count.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


SESSION_WINDOW_SQL = """
WITH f AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts >= lag(ts) OVER w + INTERVAL '30 minutes'
         THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM f)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload extraction (§2.8 JSON.parse analog): props.k stats
    per event_type."""
    e = load(spark, sf_dir, "events")
    # try_cast: a non-numeric $.k in dirty JSON must become NULL (as a
    # missing key already does), not fail the whole job under ANSI mode
    k = F.get_json_object(F.col("props"), "$.k").try_cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            CF.round_det(F.sum("k").cast("double") / F.count(F.lit(1)), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_SQL = """
WITH k AS (
  -- json_valid guard: DuckDB json_extract_string RAISES on malformed
  -- JSON where Spark get_json_object returns NULL — the dirty-JSON
  -- tolerance the Spark side is deliberately built for must not crash
  -- its own oracle
  SELECT event_type,
    TRY_CAST(CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS INT) AS k
  FROM events)
SELECT event_type,
  floor((sum(k)::DOUBLE / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_k,
  max(k) AS max_k
FROM k GROUP BY event_type ORDER BY event_type
"""


# ----------------------------------------------------------- as-of join


def asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom operator Spark lacks natively (operators/asof.py): each
    purchase joined to the user's latest view at-or-before it."""
    from chillastic_spark.operators.asof import asof_join

    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    # pre-dedup ties: two views at the SAME (user, ts) would otherwise
    # be resolved by the operator's deterministic hash tiebreak but by
    # an ARBITRARY pick in DuckDB's ASOF JOIN — collapse to max(value)
    # per instant on BOTH sides so no tie survives to the as-of
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_view_value"))
    )
    return asof_join(
        purchases, views, key="user_id", ts="ts", value_cols=["last_view_value"]
    ).select("user_id", "event_id", "ts", "last_view_value")


ASOF_SQL = """
SELECT p.user_id, p.event_id, p.ts, v.value AS last_view_value
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (
  SELECT user_id, ts, max(value) AS value FROM events
  WHERE event_type = 'view' GROUP BY user_id, ts) v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


# -------------------------------------------- §2.8 scalar function library


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mutator stdlib (SURVEY §2.8) through the oracle gate: regex
    extract/replace, date format/arith, number formatting, casing."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.datediff(F.lit("2002-01-01"), F.col("o_orderdate")).alias("days_before_2002"),
        # try_cast: a priority without a leading digit extracts '' and
        # a plain cast would fail the job under ANSI mode
        F.regexp_extract("o_orderpriority", r"^(\d+)", 1)
        .try_cast("int")
        .alias("priority_rank"),
        F.regexp_replace("o_orderpriority", r"^\d+-", "").alias("priority_name"),
        F.format_number(F.col("o_totalprice").cast("decimal(18,2)"), 2).alias("price_fmt"),
        F.lower("o_orderstatus").alias("status_lower"),
        F.substring("o_orderpriority", 1, 1).alias("priority_digit"),
    )


SCALAR_FUNCTIONS_SQL = """
SELECT o_orderkey,
  strftime(o_orderdate, '%Y-%m') AS order_month,
  datediff('day', o_orderdate::DATE, DATE '2002-01-01') AS days_before_2002,
  TRY_CAST(regexp_extract(o_orderpriority, '^(\\d+)', 1) AS INT) AS priority_rank,
  regexp_replace(o_orderpriority, '^\\d+-', '') AS priority_name,
  -- sign split via abs(): // floors negatives and % keeps the sign, so
  -- a negative amount would format as '-13.-3' instead of '-12.34'
  (CASE WHEN o_totalprice < 0 THEN '-' ELSE '' END) ||
  format('{:,}', (abs(o_totalprice::DECIMAL(18,2)) * 100)::BIGINT // 100) || '.' ||
    lpad(((abs(o_totalprice::DECIMAL(18,2)) * 100)::BIGINT % 100)::VARCHAR, 2, '0') AS price_fmt,
  lower(o_orderstatus) AS status_lower,
  substring(o_orderpriority, 1, 1) AS priority_digit
FROM orders WHERE o_orderkey <= 500
"""


def snapshot_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store reconciliation after a transfer: diff two snapshots of
    the documents store — the "source" (doc_id % 4 != 0, with doc_id %
    5 == 0 texts since edited) vs the "destination" (doc_id % 3 != 0)
    — by full-outer joining on the key and comparing content
    fingerprints, reporting per-source added / removed / changed /
    unchanged counts. This is the verification step a store-to-store
    transfer (engine.py Transfer; reference transfer.js) runs to prove
    delivery: key-set difference + checksum equality, all map-side
    computable per slice.

    Scale shape: fingerprints are computed in the scan (narrow), the
    diff is one equi-join shuffle on the key, and the report is
    slice-cardinality."""
    d = load(spark, sf_dir, "documents")
    edited = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" rev2"))
    ).otherwise(F.col("text"))
    src = d.filter(F.col("doc_id") % 4 != 0).select(
        "doc_id", "source", CF.fingerprint(edited).alias("fp")
    )
    dst = d.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id", "source", CF.fingerprint("text").alias("fp")
    )
    j = src.alias("s").join(dst.alias("d"), "doc_id", "full_outer")
    status = (
        F.when(F.col("d.fp").isNull(), F.lit("added"))
        .when(F.col("s.fp").isNull(), F.lit("removed"))
        .when(F.col("s.fp") != F.col("d.fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            F.coalesce(F.col("s.source"), F.col("d.source")).alias("source"),
            status.alias("status"),
        )
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SNAPSHOT_RECONCILE_SQL = f"""
WITH src AS (
  SELECT doc_id, source,
         {CF.fingerprint_sql(
             "CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END"
         )} AS fp
  FROM documents WHERE doc_id % 4 != 0),
dst AS (
  SELECT doc_id, source,
         {CF.fingerprint_sql("text")} AS fp
  FROM documents WHERE doc_id % 3 != 0),
j AS (
  SELECT coalesce(s.source, d.source) AS source,
         CASE WHEN d.fp IS NULL THEN 'added'
              WHEN s.fp IS NULL THEN 'removed'
              WHEN s.fp != d.fp THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM src s FULL OUTER JOIN dst d ON s.doc_id = d.doc_id)
SELECT source, status, count(*)::BIGINT AS n_docs
FROM j GROUP BY source, status
"""


QUERIES: dict[str, Query] = {
    "scan_projection": Query(scan_projection, SCAN_PROJECTION_SQL),
    "asof_view_before_purchase": Query(asof_view_before_purchase, ASOF_SQL),
    "scalar_functions": Query(scalar_functions, SCALAR_FUNCTIONS_SQL),
    "count_per_slice": Query(count_per_slice, COUNT_PER_SLICE_SQL),
    "size_stats": Query(size_stats, SIZE_STATS_SQL),
    "size_histogram": Query(size_histogram, SIZE_HISTOGRAM_SQL),
    "backlog_totals": Query(backlog_totals, BACKLOG_TOTALS_SQL),
    "resume_anti_join": Query(resume_anti_join, RESUME_ANTI_JOIN_SQL),
    "distinct_slices": Query(distinct_slices, DISTINCT_SLICES_SQL),
    "backlog_union": Query(backlog_union, BACKLOG_UNION_SQL),
    "latest_event_per_user": Query(latest_event_per_user, LATEST_EVENT_SQL),
    "reroute_by_month": Query(reroute_by_month, REROUTE_SQL),
    "mutate_pipeline": Query(mutate_pipeline, MUTATE_PIPELINE_SQL),
    "events_hourly": Query(events_hourly, EVENTS_HOURLY_SQL, headline=True),
    "sessionize": Query(sessionize, SESSIONIZE_SQL, headline=True),
    "session_window_stats": Query(session_window_stats, SESSION_WINDOW_SQL),
    "events_json_extract": Query(events_json_extract, EVENTS_JSON_SQL),
    "snapshot_reconcile": Query(snapshot_reconcile, SNAPSHOT_RECONCILE_SQL),
}
