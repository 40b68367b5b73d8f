"""Regression tests for the round-6 query-surface review findings:

1. Q2_SQL correlated on p_brand with plain `=`, silently excluding
   NULL-brand parts that the Spark window groups and emits.
2. EVENTS_JSON_SQL crashed on malformed JSON (DuckDB
   json_extract_string raises) where the Spark side deliberately
   tolerates dirty props via get_json_object → NULL.
3. SCALAR_FUNCTIONS_SQL's hand-rolled money formatter mangled negative
   amounts ('-12.34' → '-13.-3': // floors, % keeps sign).
4. hybrid_search_rrf ranked the already-truncated bm25 top-20 to
   RRF_DEPTH=50, silently capping the text arm's candidate depth at 20
   (verified via the shared-definition rewire; driver gate hash-checks
   the depth-50 semantics end-to-end).
5. Four hand-maintained clones of the interpolated-percentile cell —
   now one definition (functions.pct_cell / pct_cell_sql).
"""
import duckdb
import pytest


def test_q2_oracle_includes_null_brand_parts():
    from chillastic_spark.queries.relational3 import Q2_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE part AS SELECT * FROM (VALUES "
        "(1, NULL, 5.0), (2, NULL, 7.0), (3, 'B', 4.0), (4, 'B', 4.0)"
        ") t(p_partkey, p_brand, p_retailprice)"
    )
    got = con.sql(Q2_SQL).fetchall()
    keys = sorted(r[0] for r in got)
    # NULL brand is ONE group (Spark window semantics): its min-priced
    # part (1) is in; both tied 'B' parts are in
    assert keys == [1, 3, 4], got


def test_events_json_oracle_tolerates_malformed_props():
    from chillastic_spark.queries.engine_parity import EVENTS_JSON_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        "('a', '{\"k\": 3}'), ('a', '{bad json'), ('b', NULL)"
        ") t(event_type, props)"
    )
    got = {r[0]: (r[1], r[2]) for r in con.sql(EVENTS_JSON_SQL).fetchall()}
    # malformed and NULL props count as NULL k (Spark get_json_object
    # semantics), never crash the oracle
    assert got["a"] == (1.5, 3)  # sum 3 / count 2
    assert got["b"] == (None, None)


def test_scalar_oracle_formats_negative_money():
    from chillastic_spark.queries.engine_parity import SCALAR_FUNCTIONS_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders AS SELECT * FROM (VALUES "
        "(1, DATE '2001-06-01', '1-URGENT', 'O', -12.34), "
        "(2, DATE '2001-06-01', '2-HIGH', 'F', 1234.50)"
        ") t(o_orderkey, o_orderdate, o_orderpriority, o_orderstatus, o_totalprice)"
    )
    got = {r[0]: r[5] for r in con.sql(SCALAR_FUNCTIONS_SQL).fetchall()}
    assert got[1] == "-12.34"
    assert got[2] == "1,234.50"


def test_pct_cell_single_definition(spark):
    """The shared percentile cell reproduces percentile_cont on a known
    vector, Spark and DuckDB alike."""
    from pyspark.sql import Window, functions as F

    from chillastic_spark import functions as CF

    vals = [1.0, 2.0, 4.0, 8.0, 16.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id int, v double")
    wr = Window.orderBy("v", "id")
    r = df.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    for p, want in ((0.5, 4.0), (0.25, 2.0), (0.9, 12.8)):
        got = (
            r.filter(CF.pct_keep(F.col("rn"), F.col("n"), p))
            .agg(F.sum(CF.pct_cell(F.col("v"), F.col("rn"), F.col("n"), p)))
            .collect()[0][0]
        )
        assert got == pytest.approx(want), (p, got)
        con = duckdb.connect()
        (duck,) = con.execute(
            "SELECT sum("
            + CF.pct_cell_sql("v", p)
            + ") FROM (SELECT v, row_number() OVER (ORDER BY v) AS rn,"
            "  count(*) OVER () AS n FROM (SELECT unnest(?::DOUBLE[]) AS v))"
            f" WHERE {CF.pct_keep_sql(p)}",
            [vals],
        ).fetchone()
        assert duck == pytest.approx(want), (p, duck)
