"""Batch 13 — the rest of the search-engine surface: fuzzy matching,
wildcard/prefix queries, facets, snippet highlighting, and keyset
(search_after) pagination. Together with queries/search.py (BM25,
AND/phrase, hybrid RRF) and sources/search_index.py (materialized /
incrementally-maintained postings) this covers the query side of the
Elasticsearch model the reference's reindexer feeds.

Scale notes: every query here is one documents scan (no joins except
the tiny facet dim / single-row cursor); fuzzy+wildcard filter tokens
BEFORE any shuffle; with the materialized index the same shapes run
off postings instead (prefix predicates ride the sorted-term footer
ranges — tests/test_search_index.py pins the layout).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chillastic_spark import functions as CF
from chillastic_spark.queries import Query
from chillastic_spark.queries.documents import _W
from chillastic_spark.queries.search import (
    _BM25_RANKED_CTE,
    _POSTINGS_SQL,
    TERMS,
    _postings,
    bm25_scored,
)
from chillastic_spark.tables import load

# ------------------------------------------------------- fuzzy search

FUZZY_QUERY = "tabl"  # deliberate misspelling of 'table' (1 edit)
FUZZY_MAX_EDITS = 1


def fuzzy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy term query (ES `fuzziness: 1`): match tokens within
    Levenshtein distance 1 of the (misspelled) query term. JVM-side
    levenshtein on the exploded token stream, filtered before the
    groupBy shuffle; per-doc hit count + the sorted set of matched
    vocab terms."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(CF.words("text")).alias("term"))
    hits = toks.filter(F.levenshtein("term", F.lit(FUZZY_QUERY)) <= FUZZY_MAX_EDITS)
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.concat_ws(",", F.array_sort(F.collect_set("term"))).alias("matched_terms"),
    )


FUZZY_SQL = f"""
SELECT doc_id, count(*) AS n_hits,
       array_to_string(list_sort(list_distinct(list(term))), ',') AS matched_terms
FROM (SELECT doc_id, unnest({_W}) AS term FROM documents)
WHERE levenshtein(term, '{FUZZY_QUERY}') <= {FUZZY_MAX_EDITS}
GROUP BY doc_id
"""


# ---------------------------------------------------- wildcard search

PREFIX = "sc"  # matches e.g. scan


def wildcard_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix (wildcard `sc*`) query: per-doc counts of matching
    tokens + the matched terms. On the materialized index the same
    predicate becomes a contiguous range of the sorted postings
    (footer-skipped); here it's the one-scan batch shape."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(CF.words("text")).alias("term"))
    hits = toks.filter(F.col("term").startswith(PREFIX))
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.concat_ws(",", F.array_sort(F.collect_set("term"))).alias("matched_terms"),
    )


WILDCARD_SQL = f"""
SELECT doc_id, count(*) AS n_hits,
       array_to_string(list_sort(list_distinct(list(term))), ',') AS matched_terms
FROM (SELECT doc_id, unnest({_W}) AS term FROM documents)
WHERE term LIKE '{PREFIX}%'
GROUP BY doc_id
"""


# ------------------------------------------------------ faceted search

def search_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES-style facet aggregation on a conjunctive query: docs
    matching ALL query terms, bucketed by (lang, source) with doc and
    hit counts — the aggregation panel next to search results. The
    match runs on postings (filter-before-shuffle); facets join the
    matched ids back to the slim (doc_id, lang, source) projection."""
    p = _postings(spark, sf_dir, TERMS)
    matched = (
        p.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nt"), F.sum("tf").alias("hits"))
        .filter(F.col("nt") == len(TERMS))
        .select("doc_id", "hits")
    )
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return (
        matched.join(d, "doc_id")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("hits").alias("total_hits"))
    )


FACETS_SQL = f"""
WITH m AS (
  SELECT doc_id, sum(tf) AS hits
  FROM ({_POSTINGS_SQL})
  GROUP BY doc_id HAVING count(*) = {len(TERMS)})
SELECT lang, source, count(*) AS n_docs, sum(hits)::BIGINT AS total_hits
FROM m JOIN documents USING (doc_id)
GROUP BY lang, source
"""


# --------------------------------------------------------- highlights

SNIPPET_TERM = TERMS[0]
SNIPPET_RADIUS = 3


def search_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highlight/snippet extraction: the ±3-token window around the
    FIRST occurrence of the query term — ES highlighting's fragment,
    as pure array ops (array_position + slice), zero shuffle."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", CF.words("text").alias("w"))
    pos = F.array_position("w", SNIPPET_TERM)
    start = F.greatest(pos - SNIPPET_RADIUS, F.lit(1))
    snippet = F.concat_ws(
        " ", F.slice("w", start, F.lit(2 * SNIPPET_RADIUS + 1))
    )
    return (
        toks.select("doc_id", pos.alias("pos"), snippet.alias("snippet"))
        .filter(F.col("pos") > 0)
        .select("doc_id", "pos", "snippet")
    )


SNIPPETS_SQL = f"""
WITH t AS (SELECT doc_id, {_W} AS w FROM documents),
p AS (SELECT doc_id, w, coalesce(list_position(w, '{SNIPPET_TERM}'), 0) AS pos FROM t)
SELECT doc_id, pos,
       array_to_string(list_slice(w, greatest(pos - {SNIPPET_RADIUS}, 1),
                       greatest(pos - {SNIPPET_RADIUS}, 1) + {2 * SNIPPET_RADIUS}), ' ') AS snippet
FROM p WHERE pos > 0
"""


# ------------------------------------------------- keyset pagination

PAGE_SIZE = 20


def search_after_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 2 via keyset (ES `search_after`) semantics: the cursor is
    the (bm25, doc_id) of the last row of page 1, and page 2 is
    `WHERE score < cursor OR (score = cursor AND id > cursor_id)` —
    NOT offset/limit. Deep pagination by offset re-sorts and discards
    N·page rows; the keyset predicate prunes in the scan. The cursor
    derives inside the query (rank-20 row as a 1-row broadcast) via a
    TakeOrderedAndProject top-k + struct-max — NOT a global row_number
    window, so no corpus-sized ranking serializes through one task."""
    from chillastic_spark.operators.topk import last_of_topk
    from chillastic_spark.persist import materialize

    # two consumers (cursor derivation + page-2 scan): materialize so
    # the tokenize/explode/join BM25 pipeline runs once, not twice
    full = materialize(bm25_scored(spark, sf_dir))
    cursor = F.broadcast(last_of_topk(full, "bm25", "doc_id", PAGE_SIZE))
    page2 = (
        full.crossJoin(cursor)
        .filter(
            (F.col("bm25") < F.col("cur_score"))
            | ((F.col("bm25") == F.col("cur_score")) & (F.col("doc_id") > F.col("cur_id")))
        )
        .select("doc_id", "bm25", "n_terms_matched")
    )
    return page2.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(PAGE_SIZE)


SEARCH_AFTER_SQL = f"""
WITH {_BM25_RANKED_CTE},
cur AS (
  SELECT bm25 AS cur_score, doc_id AS cur_id FROM bm25_ranked
  QUALIFY row_number() OVER (ORDER BY bm25 DESC, doc_id) = {PAGE_SIZE})
SELECT doc_id, bm25, n_terms_matched
FROM bm25_ranked CROSS JOIN cur
WHERE bm25 < cur_score OR (bm25 = cur_score AND doc_id > cur_id)
ORDER BY bm25 DESC, doc_id ASC LIMIT {PAGE_SIZE}
"""


# ------------------------------------------------------- bool query

MUST = ["table"]
SHOULD = ["scan", "join"]  # minimum_should_match = 1
MUST_NOT = ["slow"]


def bool_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `bool` query: must=[table], should=[scan, join] (min 1),
    must_not=[slow]. One postings pass over the union of all clause
    terms (filter-before-shuffle), then conditional aggregates decide
    membership and score = total must+should hits. The must_not clause
    is a conditional count, not a second anti-join pass."""
    all_terms = MUST + SHOULD + MUST_NOT
    p = _postings(spark, sf_dir, all_terms)
    is_must = F.col("term").isin(MUST)
    is_should = F.col("term").isin(SHOULD)
    is_not = F.col("term").isin(MUST_NOT)
    agg = p.groupBy("doc_id").agg(
        F.sum(F.when(is_must, 1).otherwise(0)).alias("must_terms"),
        F.sum(F.when(is_should, 1).otherwise(0)).alias("should_terms"),
        F.sum(F.when(is_not, 1).otherwise(0)).alias("not_terms"),
        F.sum(F.when(is_must | is_should, F.col("tf")).otherwise(0)).alias("score_hits"),
    )
    return agg.filter(
        (F.col("must_terms") == len(MUST))
        & (F.col("should_terms") >= 1)
        & (F.col("not_terms") == 0)
    ).select("doc_id", "should_terms", "score_hits")


_ALL_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in MUST + SHOULD + MUST_NOT) + ")"
_MUST_SQL = "(" + ", ".join(f"'{t}'" for t in MUST) + ")"
_SHOULD_SQL = "(" + ", ".join(f"'{t}'" for t in SHOULD) + ")"
_NOT_SQL = "(" + ", ".join(f"'{t}'" for t in MUST_NOT) + ")"

BOOL_SEARCH_SQL = f"""
WITH p AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest({_W}) AS term FROM documents)
  WHERE term IN {_ALL_TERMS_SQL}
  GROUP BY doc_id, term)
SELECT doc_id,
       sum(CASE WHEN term IN {_SHOULD_SQL} THEN 1 ELSE 0 END)::BIGINT AS should_terms,
       sum(CASE WHEN term IN {_MUST_SQL} OR term IN {_SHOULD_SQL} THEN tf ELSE 0 END)::BIGINT AS score_hits
FROM p
GROUP BY doc_id
HAVING sum(CASE WHEN term IN {_MUST_SQL} THEN 1 ELSE 0 END) = {len(MUST)}
   AND sum(CASE WHEN term IN {_SHOULD_SQL} THEN 1 ELSE 0 END) >= 1
   AND sum(CASE WHEN term IN {_NOT_SQL} THEN 1 ELSE 0 END) = 0
"""


# -------------------------------------------------- significant terms

SIG_QUERY_TERM = "table"
SIG_K = 15
SIG_MIN_FG = 5


def significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `significant_terms` aggregation: terms over-represented in
    the matched set (docs containing the query term) relative to the
    whole corpus — "what distinguishes these results". Score is the
    simple lift (fg_rate / bg_rate) on doc frequencies; top-15 by
    rounded score with term tie-break, self-matches excluded.

    Shape: ONE tokenise feeds both the foreground flag and the
    (doc, term) postings; fg/bg doc frequencies come from conditional
    aggregates of the same groupBy, and the corpus totals come from
    that SAME aggregate (fg_total = the query term's own bg_count —
    docs containing it) plus an un-tokenised doc count — truly no
    second tokenise pass; totals ride a 1-row broadcast."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        CF.words("text").alias("w"),
    ).select(
        "doc_id",
        F.array_contains("w", SIG_QUERY_TERM).alias("fg"),
        F.explode(F.array_distinct("w")).alias("term"),
    )
    from chillastic_spark.persist import materialize

    per_term = materialize(  # feeds the scores AND the fg total
        toks.groupBy("term").agg(
            F.sum(F.when(F.col("fg"), 1).otherwise(0)).alias("fg_count"),
            F.count(F.lit(1)).alias("bg_count"),
        )
    )
    totals = (
        per_term.filter(F.col("term") == SIG_QUERY_TERM)
        .agg(
            F.coalesce(F.sum("bg_count"), F.lit(0))
            .cast("double")
            .alias("fg_total")
        )
        .crossJoin(d.agg(F.count(F.lit(1)).cast("double").alias("bg_total")))
    )
    scored = (
        per_term.filter(
            (F.col("term") != SIG_QUERY_TERM) & (F.col("fg_count") >= SIG_MIN_FG)
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "term",
            "fg_count",
            "bg_count",
            CF.round_det(
                (F.col("fg_count") / F.col("fg_total"))
                / (F.col("bg_count") / F.col("bg_total")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), F.asc("term")).limit(SIG_K)


SIGNIFICANT_SQL = f"""
WITH t AS (
  SELECT doc_id, {_W} AS w FROM documents),
e AS (
  SELECT doc_id, list_contains(w, '{SIG_QUERY_TERM}') AS fg,
         unnest(list_distinct(w)) AS term
  FROM t),
per_term AS (
  SELECT term,
         sum(CASE WHEN fg THEN 1 ELSE 0 END)::BIGINT AS fg_count,
         count(*) AS bg_count
  FROM e GROUP BY term),
totals AS (
  SELECT sum(CASE WHEN list_contains(w, '{SIG_QUERY_TERM}') THEN 1 ELSE 0 END)::DOUBLE AS fg_total,
         count(*)::DOUBLE AS bg_total
  FROM t)
SELECT term, fg_count, bg_count,
       {CF.round_det_sql("(fg_count / fg_total) / (bg_count / bg_total)", 6)} AS lift
FROM per_term CROSS JOIN totals
WHERE term != '{SIG_QUERY_TERM}' AND fg_count >= {SIG_MIN_FG}
ORDER BY lift DESC, term ASC LIMIT {SIG_K}
"""


# ---------------------------------------------------------- percolate

STORED_QUERIES: dict[str, list[str]] = {
    "alerts_db": ["table", "scan"],
    "alerts_join": ["join"],
    "alerts_perf": ["slow", "fast"],
    "alerts_none": ["zzz_nonexistent_term"],
}


def percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percolator (reverse search): match every document against the
    STORED conjunctive queries and report per-query match volume — the
    alerting/routing primitive (stored queries watch the stream, not
    the other way around).

    Shape: stored queries are a literal |Σterms|-row broadcast joined
    against one postings pass over the union of their terms; a query
    matches a doc when its matched-distinct-term count equals the query
    size. Zero-match queries survive via a left join from the query
    domain."""
    rows = [
        (qid, t, len(terms))
        for qid, terms in STORED_QUERIES.items()
        for t in terms
    ]
    qdf = spark.createDataFrame(rows, "qid string, term string, qsize int")
    all_terms = sorted({t for terms in STORED_QUERIES.values() for t in terms})
    p = _postings(spark, sf_dir, all_terms)
    matched = (
        p.join(F.broadcast(qdf), "term")
        .groupBy("qid", "qsize", "doc_id")
        .agg(F.count(F.lit(1)).alias("nt"))
        .filter(F.col("nt") == F.col("qsize"))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )
    domain = spark.createDataFrame(
        [(q,) for q in STORED_QUERIES], "qid string"
    )
    return domain.join(matched, "qid", "left").select(
        "qid",
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        "first_doc",
    )


_QVALUES = ", ".join(
    f"('{qid}', '{t}', {len(terms)})"
    for qid, terms in STORED_QUERIES.items()
    for t in terms
)
_QDOMAIN = ", ".join(f"('{qid}')" for qid in STORED_QUERIES)
_QALL_TERMS = "(" + ", ".join(
    f"'{t}'" for t in sorted({t for ts in STORED_QUERIES.values() for t in ts})
) + ")"

PERCOLATE_SQL = f"""
WITH q(qid, term, qsize) AS (VALUES {_QVALUES}),
p AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest({_W}) AS term FROM documents)
  WHERE term IN {_QALL_TERMS}
  GROUP BY doc_id, term),
m AS (
  SELECT qid, doc_id
  FROM p JOIN q USING (term)
  GROUP BY qid, qsize, doc_id
  HAVING count(*) = qsize),
agg AS (
  SELECT qid, count(*) AS n_docs, min(doc_id) AS first_doc FROM m GROUP BY qid),
dom(qid) AS (VALUES {_QDOMAIN})
SELECT dom.qid, coalesce(n_docs, 0) AS n_docs, first_doc
FROM dom LEFT JOIN agg ON dom.qid = agg.qid
"""


# ----------------------------------------------------------- rank eval

_EVAL_K = 10


def search_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `_rank_eval`: precision@10, MRR, and NDCG@10 of the BM25
    ranking, judged against a derivable relevance set (docs containing
    ALL query terms — the conjunctive matches). One row of corpus-level
    search-quality metrics.

    Determinism: ranks come from the rounded-score ordering; every
    metric sums ≤10 individually-rounded DECIMAL summands (gain
    1/log2(rank+1)), and IDCG folds the same rounded terms — division
    of two exact-to-double values on both engines. The top-10 comes
    from a TakeOrderedAndProject + in-plan re-rank (operators.topk),
    not a global window."""
    from chillastic_spark.operators.topk import ranked_topk

    full = bm25_scored(spark, sf_dir)
    topk = ranked_topk(full, "bm25", "doc_id", _EVAL_K, "rn")
    from chillastic_spark.queries.search import TERMS

    # the relevance set (docs matching ALL query terms) is already a
    # column of the BM25 frame — keyword_search_and here would re-run
    # the whole tokenise+postings pass a THIRD time over the corpus
    # just to re-derive n_terms_matched == |TERMS|
    rel = full.filter(F.col("n_terms_matched") == len(TERMS)).select(
        "doc_id", F.lit(1).alias("rel")
    )
    judged = topk.join(F.broadcast(rel), "doc_id", "left").select(
        "rn", F.coalesce("rel", F.lit(0)).alias("rel")
    )
    gain = CF.round_det(F.lit(1.0) / F.log2(F.col("rn") + 1), 9)
    inv_rank = CF.round_det(F.lit(1.0) / F.col("rn"), 9)
    metrics = judged.agg(
        (F.sum("rel") / F.lit(float(_EVAL_K))).alias("p_at_k"),
        F.max(F.when(F.col("rel") == 1, inv_rank).otherwise(F.lit(0.0))).alias("mrr"),
        F.sum(
            F.when(F.col("rel") == 1, gain).otherwise(F.lit(0.0)).cast("decimal(18,9)")
        )
        .cast("double")
        .alias("dcg"),
    )
    n_rel = rel.agg(F.count(F.lit(1)).alias("n_rel"))
    ideal = (
        n_rel.select(
            "n_rel",
            # n_rel == 0 must yield an EMPTY result (oracle's range(1,1)
            # is empty): unguarded, sequence(1, 0) descends to [1, 0]
            # and the i=0 row's 1/log2(1) divides by zero under ANSI
            F.explode(
                F.when(
                    F.col("n_rel") >= 1,
                    F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(_EVAL_K))),
                ).otherwise(F.array().cast("array<long>"))
            ).alias("i"),
        )
        .select(
            "n_rel",
            CF.round_det(F.lit(1.0) / F.log2(F.col("i") + 1), 9).cast("decimal(18,9)").alias(
                "g"
            ),
        )
        .groupBy("n_rel")
        .agg(F.sum("g").cast("double").alias("idcg"))
    )
    return metrics.crossJoin(F.broadcast(ideal)).select(
        "n_rel",
        CF.round_det(F.col("p_at_k"), 6).alias("p_at_k"),
        CF.round_det(F.col("mrr"), 6).alias("mrr"),
        CF.round_det(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_k"),
    )


RANK_EVAL_SQL = f"""
WITH {_BM25_RANKED_CTE},
topk AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
  FROM bm25_ranked QUALIFY rn <= {_EVAL_K}),
rel AS (
  SELECT doc_id FROM ({_POSTINGS_SQL}) GROUP BY doc_id HAVING count(*) = {len(TERMS)}),
judged AS (
  SELECT rn, CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM topk LEFT JOIN rel ON topk.doc_id = rel.doc_id),
m AS (
  SELECT sum(rel) / {float(_EVAL_K)} AS p_at_k,
         max(CASE WHEN rel = 1 THEN {CF.round_det_sql("1.0 / rn", 9)} ELSE 0.0 END) AS mrr,
         sum((CASE WHEN rel = 1 THEN {CF.round_det_sql("1.0 / log2(rn + 1)", 9)} ELSE 0.0 END)::DECIMAL(18,9))::DOUBLE AS dcg
  FROM judged),
nr AS (SELECT count(*) AS n_rel FROM rel),
ideal AS (
  SELECT n_rel, sum(({CF.round_det_sql("1.0 / log2(i + 1)", 9)})::DECIMAL(18,9))::DOUBLE AS idcg
  FROM nr, (SELECT unnest(range(1, least((SELECT n_rel FROM nr), {_EVAL_K}) + 1)) AS i)
  GROUP BY n_rel)
SELECT n_rel,
       {CF.round_det_sql("p_at_k", 6)} AS p_at_k,
       {CF.round_det_sql("mrr", 6)} AS mrr,
       {CF.round_det_sql("dcg / idcg", 6)} AS ndcg_at_k
FROM m CROSS JOIN ideal
"""


QUERIES: dict[str, Query] = {
    "bool_search": Query(bool_search, BOOL_SEARCH_SQL),
    "significant_terms": Query(significant_terms, SIGNIFICANT_SQL),
    "percolate": Query(percolate, PERCOLATE_SQL),
    "search_rank_eval": Query(search_rank_eval, RANK_EVAL_SQL),
    "fuzzy_search": Query(fuzzy_search, FUZZY_SQL),
    "wildcard_search": Query(wildcard_search, WILDCARD_SQL),
    "search_facets": Query(search_facets, FACETS_SQL),
    "search_snippets": Query(search_snippets, SNIPPETS_SQL),
    "search_after_page": Query(search_after_page, SEARCH_AFTER_SQL),
}
