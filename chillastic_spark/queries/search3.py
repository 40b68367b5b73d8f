"""ES query surface round-out 3: rescore, multi-field match, and
minimum_should_match — the remaining high-traffic Elasticsearch query
shapes (the reference is ES tooling, reference README.md:1-10; its
engine stores what these queries serve).

Scale shapes:
* rescore touches the FULL ranking only once (the primary BM25 pass);
  the expensive secondary scorer runs on a ``RESCORE_WINDOW``-row
  candidate set — exactly ES's rescore-window contract, and on Spark a
  broadcast-sized intermediate.
* multi_match tokenises once and tags each token with its field by
  POSITION (posexplode), so two "fields" cost one scan and one shuffle.
* terms_set is the same single postings pass as bool_search with a
  parameterised distinct-term threshold.

Determinism: per-term scores round to 9 digits then sum through
DECIMAL(18,9); every ranking orders by the ROUNDED score + doc_id.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chillastic_spark import functions as CF
from chillastic_spark.queries import Query
from chillastic_spark.queries.documents import _W
from chillastic_spark.queries.search import (
    _BM25_RANKED_CTE,
    PHRASE,
    TERMS,
    _postings,
    bm25_scored,
    phrase_hits,
    phrase_hits_sql,
)
from chillastic_spark.tables import load

# ---------------------------------------------------------------- rescore

RESCORE_WINDOW = 50  # ES rescore window_size
QUERY_WEIGHT = 1.0
RESCORE_WEIGHT = 0.5
RESCORE_K = 10


def search_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `rescore`: re-rank the top-``RESCORE_WINDOW`` BM25 candidates
    with a phrase-proximity bonus — final = query_weight·bm25 +
    rescore_weight·(adjacent-"table scan" count). Docs outside the
    window keep their primary order and never reach the second scorer
    (we emit the re-ranked window top-``RESCORE_K``).

    Scale: the candidate window is a TakeOrderedAndProject top-k (no
    global row_number window), then BROADCAST into the documents scan so
    the expensive phrase pass tokenizes only the ≤window docs — the
    second scorer literally never sees a non-candidate, exactly like ES
    rescore."""
    cand = (
        bm25_scored(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(RESCORE_WINDOW)
    )
    d = load(spark, sf_dir, "documents")
    phr = (
        d.join(F.broadcast(cand), "doc_id")
        .select("doc_id", "bm25", CF.words("text").alias("w"))
        .select("doc_id", "bm25", phrase_hits("w", *PHRASE).alias("phrase_n"))
    )
    return (
        phr.withColumn(
            "score",
            F.col("bm25") * F.lit(QUERY_WEIGHT)
            + F.col("phrase_n").cast("double") * F.lit(RESCORE_WEIGHT),
        )
        .select("doc_id", "bm25", "phrase_n", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(RESCORE_K)
    )




SEARCH_RESCORE_SQL = f"""
WITH {_BM25_RANKED_CTE},
cand AS (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rnk
  FROM bm25_ranked QUALIFY rnk <= {RESCORE_WINDOW}),
phr AS (
  SELECT doc_id, {phrase_hits_sql(_W, *PHRASE)} AS phrase_n
  FROM documents)
SELECT cand.doc_id, bm25,
       coalesce(phrase_n, 0)::INT AS phrase_n,
       bm25 * {QUERY_WEIGHT} + coalesce(phrase_n, 0)::DOUBLE * {RESCORE_WEIGHT} AS score
FROM cand LEFT JOIN phr ON cand.doc_id = phr.doc_id
ORDER BY score DESC, cand.doc_id ASC LIMIT {RESCORE_K}
"""


# ------------------------------------------------------------- multi_match

TITLE_LEN = 8  # tokens 1..8 are the synthetic "title" field
TITLE_BOOST = 2.0
MM_K = 15


def multi_match_best_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `multi_match` (best_fields / dis_max): TF-IDF score per
    FIELD — title (first {TITLE_LEN} tokens, boost 2.0) vs body (the
    rest) — final score = max over fields of boost·Σ_t idf_field(t)·tf.

    One tokenise, one posexplode; the field tag is derived from token
    POSITION, so both "fields" ride a single scan and one shuffle.
    idf is per (field, term) — a broadcast 2×|terms| join. N comes from
    an in-plan 1-row broadcast aggregate (the bm25_topk stats pattern),
    not a separate driver count() job."""
    d = load(spark, sf_dir, "documents")
    stats = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    toks = d.select("doc_id", CF.words("text").alias("w"))
    tagged = toks.select(
        "doc_id", F.posexplode("w").alias("pos", "term")
    ).withColumn(
        "field", F.when(F.col("pos") < TITLE_LEN, "title").otherwise("body")
    ).filter(F.col("term").isin(TERMS))
    tf = tagged.groupBy("doc_id", "field", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("field", "term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), ["field", "term"])
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", F.log(F.lit(1.0) + F.col("n_docs") / F.col("df"))
        )
        .withColumn(
            "tscore",
            CF.round_det(F.col("idf") * F.col("tf"), 9).cast("decimal(18,9)"),
        )
    )
    per_field = scored.groupBy("doc_id", "field").agg(
        CF.round_det(F.sum("tscore").cast("double"), 6).alias("fscore")
    )
    boosted = per_field.withColumn(
        "boosted",
        F.when(F.col("field") == "title", F.col("fscore") * F.lit(TITLE_BOOST)).otherwise(
            F.col("fscore")
        ),
    )
    return (
        boosted.groupBy("doc_id")
        .agg(F.max("boosted").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(MM_K)
    )


_TERMS_IN = "(" + ", ".join(f"'{t}'" for t in TERMS) + ")"

MULTI_MATCH_SQL = f"""
WITH t AS (SELECT doc_id, {_W} AS w FROM documents),
tagged AS (
  SELECT doc_id,
         unnest(w) AS term,
         CASE WHEN unnest(range(0, len(w))) < {TITLE_LEN}
              THEN 'title' ELSE 'body' END AS field
  FROM t),
tf AS (
  SELECT doc_id, field, term, count(*) AS tf
  FROM tagged WHERE term IN {_TERMS_IN}
  GROUP BY 1, 2, 3),
dfreq AS (
  SELECT field, term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1, 2),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.field,
    ({CF.round_det_sql("ln(1.0 + n_docs / df) * tf", 9)})::DECIMAL(18,9) AS tscore
  FROM tf JOIN dfreq ON tf.field = dfreq.field AND tf.term = dfreq.term
  CROSS JOIN n),
per_field AS (
  SELECT doc_id, field, {CF.round_det_sql("sum(tscore)::DOUBLE", 6)} AS fscore
  FROM scored GROUP BY 1, 2)
SELECT doc_id,
       max(CASE WHEN field = 'title' THEN fscore * {TITLE_BOOST} ELSE fscore END) AS score
FROM per_field GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {MM_K}
"""


# -------------------------------------------------- terms_set (min match)

TS_TERMS = ["table", "scan", "join", "merge"]
TS_MIN_MATCH = 3  # minimum_should_match


def terms_set_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `terms_set` / minimum_should_match: docs matching ≥
    ``TS_MIN_MATCH`` distinct terms of a ``TS_TERMS`` set, with the
    matched-term count and total hits. One postings pass; the threshold
    is a HAVING over the distinct-term count (bool_search's shape with
    a parameterised floor instead of fixed must/should sets)."""
    p = _postings(spark, sf_dir, TS_TERMS)
    return (
        p.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.sum("tf").alias("total_hits"),
        )
        .filter(F.col("n_matched") >= TS_MIN_MATCH)
    )


_TS_IN = "(" + ", ".join(f"'{t}'" for t in TS_TERMS) + ")"

TERMS_SET_SQL = f"""
WITH p AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest({_W}) AS term FROM documents)
  WHERE term IN {_TS_IN}
  GROUP BY doc_id, term)
SELECT doc_id, count(*) AS n_matched, sum(tf)::BIGINT AS total_hits
FROM p GROUP BY doc_id HAVING count(*) >= {TS_MIN_MATCH}
"""


QUERIES: dict[str, Query] = {
    "search_rescore": Query(search_rescore, SEARCH_RESCORE_SQL),
    "multi_match_best_fields": Query(multi_match_best_fields, MULTI_MATCH_SQL),
    "terms_set_query": Query(terms_set_query, TERMS_SET_SQL),
}
