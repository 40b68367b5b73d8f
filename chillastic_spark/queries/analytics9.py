"""Batch 17 — corpus-gate round-out: the two canonical published
LLM-corpus cleaning rule sets (Gopher quality rules, C4 line filter)
and a one-pass table profiler, all exactly oracle-checkable.

Scale notes (the 100 TB contract for each):
* `gopher_quality_flags` is pure per-row array/string expressions —
  narrow scan, zero shuffles; every rule is INTEGER arithmetic
  (3·wc ≤ chars instead of chars/wc ≥ 3) so no float divergence
  between engines and no rounding in the hot path;
* `c4_line_filter` is likewise narrow (per-row line split + filter +
  md5 of the cleaned text) — the cleaned corpus never shuffles;
* `table_profile` computes count/nulls/exact-distinct/min/max for
  every profiled column in ONE scan (multi-countDistinct = a single
  Expand over the scan); at fact-table scale swap exact distinct for
  `approx_count_distinct` via ``exact=False`` — the shape (one scan,
  |columns| output rows) is unchanged.

Rule provenance (public): Gopher quality heuristics from Rae et al.
2021 (arXiv:2112.11446 §A1.1); C4 line filtering from Raffel et al.
2020 (arXiv:1910.10683 §2.2). The synthetic corpus is single-line
prose, so both queries plant deterministic doc_id-derived structure
(bullet/ellipsis lines, javascript/lorem-ipsum/brace triggers)
in-plan on BOTH engines — the operators and their oracles see
identical inputs with every rule exercised (the analytics8 PII
precedent).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chillastic_spark import functions as CF

from chillastic_spark.queries import Query
from chillastic_spark.tables import load

STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# ----------------------------------------------------- gopher quality


def _gopher_text() -> Column:
    """documents.text + deterministic planted lines so every Gopher
    rule has non-trivial hits: every 4th doc gains two bullet lines,
    every 6th an ellipsis line, every 9th a hash-symbol run, every 3rd
    a stopword-bearing clause (the synthetic vocabulary contains at
    most one of the Gopher stopwords, so without planting the ≥2-of-8
    rule could never pass)."""
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0, F.lit(" and that is the point of it all.")
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0, F.lit("\n- bullet item one\n- bullet item two")
        ).otherwise(F.lit("")),
        F.when(did % 6 == 0, F.lit("\nthis line trails off...")).otherwise(F.lit("")),
        F.when(did % 9 == 0, F.lit(" ## ## ##")).otherwise(F.lit("")),
    )


_GOPHER_TEXT_SQL = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' and that is the point of it all.'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN chr(10) || '- bullet item one'"
    " || chr(10) || '- bullet item two' ELSE '' END"
    " || CASE WHEN doc_id % 6 = 0 THEN chr(10) || 'this line trails off...'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 9 = 0 THEN ' ## ## ##' ELSE '' END"
)


def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021 §A1.1) per doc:
    word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    bullet-line / ellipsis-line fractions, alphabetic-word fraction,
    stopword presence — plus the combined gate.

    Every rule is evaluated in integer arithmetic (cross-multiplied
    thresholds), so the flags are bit-exact on any engine and the
    whole query is a narrow projection: one scan, no shuffle, no UDF.
    """
    d = load(spark, sf_dir, "documents")
    txt = _gopher_text()
    d = d.select("doc_id", txt.alias("t"))
    d = d.select(
        "doc_id",
        "t",
        CF.words("t").alias("w"),
        F.split("t", "\n").alias("lines"),
    )
    d = d.select(
        "doc_id",
        F.size("w").alias("word_count"),
        F.aggregate(
            "w", F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("word_chars"),
        (
            (F.length("t") - F.length(F.replace("t", F.lit("#"), F.lit(""))))
            + F.floor(
                (F.length("t") - F.length(F.replace("t", F.lit("..."), F.lit(""))))
                / 3
            )
        ).cast("long").alias("symbol_count"),
        F.size(F.filter("w", lambda x: x.rlike("[A-Za-z]"))).alias("alpha_words"),
        F.size("lines").alias("n_lines"),
        F.size(
            F.filter("lines", lambda l: F.ltrim(l).startswith("- "))
        ).alias("bullet_lines"),
        F.size(
            F.filter("lines", lambda l: F.rtrim(l).endswith("..."))
        ).alias("ellipsis_lines"),
        F.size(
            F.array_intersect(
                F.transform("w", F.lower),
                F.array(*[F.lit(s) for s in STOPWORDS]),
            )
        ).alias("stop_hits"),
    )
    wc = F.col("word_count")
    flags = {
        "flag_word_count": (wc >= 50) & (wc <= 100000),
        "flag_mean_word_len": (F.col("word_chars") >= 3 * wc)
        & (F.col("word_chars") <= 10 * wc),
        "flag_symbol_ratio": 10 * F.col("symbol_count") <= wc,
        "flag_bullets": 10 * F.col("bullet_lines") <= 9 * F.col("n_lines"),
        "flag_ellipsis": 10 * F.col("ellipsis_lines") <= 3 * F.col("n_lines"),
        "flag_alpha": 5 * F.col("alpha_words") >= 4 * wc,
        "flag_stopwords": F.col("stop_hits") >= 2,
    }
    out = d.select("*", *[v.alias(k) for k, v in flags.items()])
    gate = None
    for k in flags:
        gate = F.col(k) if gate is None else (gate & F.col(k))
    return out.withColumn("pass_gopher", gate)


_GW = CF.words_sql("t")

GOPHER_SQL = f"""
WITH base AS (
  SELECT doc_id, {_GOPHER_TEXT_SQL} AS t FROM documents),
split AS (
  SELECT doc_id, t, {_GW} AS w, string_split(t, chr(10)) AS lines FROM base),
counts AS (
  SELECT doc_id,
    len(w) AS word_count,
    list_sum(list_transform(w, x -> length(x)))::BIGINT AS word_chars,
    ((length(t) - length(replace(t, '#', '')))
      + (length(t) - length(replace(t, '...', ''))) // 3)::BIGINT
      AS symbol_count,
    len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
    len(lines) AS n_lines,
    len(list_filter(lines, l -> starts_with(ltrim(l), '- '))) AS bullet_lines,
    len(list_filter(lines, l -> rtrim(l) LIKE '%...')) AS ellipsis_lines,
    len(list_intersect(list_transform(w, x -> lower(x)),
        ['the','be','to','of','and','that','have','with'])) AS stop_hits
  FROM split)
SELECT *,
  (flag_word_count AND flag_mean_word_len AND flag_symbol_ratio
   AND flag_bullets AND flag_ellipsis AND flag_alpha AND flag_stopwords)
  AS pass_gopher
FROM (
  SELECT *,
    (word_count >= 50 AND word_count <= 100000) AS flag_word_count,
    (word_chars >= 3 * word_count AND word_chars <= 10 * word_count)
      AS flag_mean_word_len,
    (10 * symbol_count <= word_count) AS flag_symbol_ratio,
    (10 * bullet_lines <= 9 * n_lines) AS flag_bullets,
    (10 * ellipsis_lines <= 3 * n_lines) AS flag_ellipsis,
    (5 * alpha_words >= 4 * word_count) AS flag_alpha,
    (stop_hits >= 2) AS flag_stopwords
  FROM counts)
"""


# -------------------------------------------------------- C4 cleaning


def _c4_text() -> Column:
    """Sentence-per-line restructuring ('. ' → '.\\n') plus planted
    C4 trigger content: every 13th doc a javascript boilerplate line,
    every 17th a lorem-ipsum run, every 19th a curly-brace code
    fragment."""
    did = F.col("doc_id")
    return F.concat(
        F.replace(F.col("text"), F.lit(". "), F.lit(".\n")),
        F.when(
            did % 13 == 0,
            F.lit("\nplease enable javascript to view the comments powered here."),
        ).otherwise(F.lit("")),
        F.when(did % 17 == 0, F.lit(" lorem ipsum dolor sit amet.")).otherwise(
            F.lit("")
        ),
        F.when(did % 19 == 0, F.lit(" { var x = 1; }")).otherwise(F.lit("")),
    )


_C4_TEXT_SQL = (
    "replace(text, '. ', '.' || chr(10))"
    " || CASE WHEN doc_id % 13 = 0 THEN chr(10) ||"
    " 'please enable javascript to view the comments powered here.'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 17 = 0 THEN ' lorem ipsum dolor sit amet.'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 19 = 0 THEN ' { var x = 1; }' ELSE '' END"
)


def c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning (Raffel et al. 2020 §2.2) per doc: keep only lines
    that end in terminal punctuation, have ≥ 5 words, and don't
    mention javascript; then gate the whole doc on ≥ 3 surviving
    lines, no 'lorem ipsum', and no '{'. Emits per-doc retention
    stats and an md5 of the cleaned text (the cross-engine witness
    that the exact surviving byte sequence matches).

    Narrow per-row expressions end-to-end — at 100 TB this is a
    scan-bound map with no shuffle; the cleaned corpus would be
    written back partition-local.
    """
    d = load(spark, sf_dir, "documents")
    d = d.select("doc_id", _c4_text().alias("t"))
    lines = F.split("t", "\n")
    kept = F.filter(
        F.transform(lines, F.trim),
        lambda l: (F.size(F.split(l, r"[ \t\n\x0b\f\r]+")) >= 5)
        & (
            l.endswith(".") | l.endswith("!") | l.endswith("?")
        )
        & ~F.lower(l).contains("javascript"),
    )
    d = d.select(
        "doc_id",
        "t",
        F.size(lines).alias("n_lines"),
        kept.alias("kept"),
    )
    cleaned = F.array_join("kept", "\n")
    return d.select(
        "doc_id",
        "n_lines",
        F.size("kept").alias("n_kept"),
        F.length(cleaned).alias("cleaned_chars"),
        F.md5(cleaned).alias("cleaned_md5"),
        (
            (F.size("kept") >= 3)
            & ~F.lower("t").contains("lorem ipsum")
            & ~F.col("t").contains("{")
        ).alias("keep_doc"),
    )


C4_SQL = f"""
WITH base AS (
  SELECT doc_id, {_C4_TEXT_SQL} AS t FROM documents),
split AS (
  SELECT doc_id, t, string_split(t, chr(10)) AS lines,
    list_filter(list_transform(string_split(t, chr(10)), x -> trim(x)),
      l -> len(regexp_split_to_array(l, '[ \\t\\n\\x0b\\f\\r]+')) >= 5
        AND (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?')
        AND NOT contains(lower(l), 'javascript')) AS kept
  FROM base)
SELECT doc_id,
  len(lines) AS n_lines,
  len(kept) AS n_kept,
  -- array_to_string([]) is NULL in DuckDB but '' in Spark's array_join
  length(coalesce(array_to_string(kept, chr(10)), '')) AS cleaned_chars,
  md5(coalesce(array_to_string(kept, chr(10)), '')) AS cleaned_md5,
  (len(kept) >= 3 AND NOT contains(lower(t), 'lorem ipsum')
   AND NOT contains(t, '{{')) AS keep_doc
FROM split
"""


# ------------------------------------------------------ table profile

PROFILE_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_returnflag",
    "l_linestatus",
]


def table_profile(
    spark: SparkSession, sf_dir: str, exact: bool = True
) -> DataFrame:
    """Per-column data profile of lineitem — row count, null count,
    distinct count, min/max (as strings) — in ONE scan: a single
    aggregate computes every column's stats (multi-countDistinct is
    one Expand over the scan), then the |columns| result structs are
    inlined into rows. l_shipdate is profiled as a DATE so min/max
    strings are engine-portable.

    ``exact=False`` swaps countDistinct for approx_count_distinct —
    the fact-table-scale knob; same plan shape, no Expand.
    """
    # fanout=True (r10): the multi-countDistinct Expand multiplies the
    # scan ~12x before the partial agg; on a parallelism-starved layout
    # the whole expansion ran in ONE scan task (measured 16.4s in the
    # sweep — the slowest registered query). Filter-free full scan, so
    # there is no pushdown to lose.
    li = load(spark, sf_dir, "lineitem", fanout=True).withColumn(
        "l_shipdate", F.col("l_shipdate").cast("date")
    )
    cols = PROFILE_COLS + ["l_shipdate"]
    distinct_of = (
        F.countDistinct if exact else lambda c: F.approx_count_distinct(c)
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            distinct_of(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"{c}__nn")).alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.inline(rows))


def _profile_sql_for(c: str, cast: str = "") -> str:
    e = f"CAST({c} AS DATE)" if cast == "date" else c
    return (
        f"SELECT '{c}' AS column_name, count(*) AS n_rows,"
        f" count(*) - count({e}) AS n_nulls,"
        f" count(DISTINCT {e}) AS n_distinct,"
        f" CAST(min({e}) AS VARCHAR) AS min_value,"
        f" CAST(max({e}) AS VARCHAR) AS max_value FROM lineitem"
    )


PROFILE_SQL = " UNION ALL ".join(
    [_profile_sql_for(c) for c in PROFILE_COLS]
    + [_profile_sql_for("l_shipdate", cast="date")]
)


QUERIES = {
    "gopher_quality_flags": Query(gopher_quality_flags, GOPHER_SQL),
    "c4_line_filter": Query(c4_line_filter, C4_SQL),
    "table_profile": Query(table_profile, PROFILE_SQL),
}
