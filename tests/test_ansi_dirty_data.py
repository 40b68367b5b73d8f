"""Dirty-data tolerance under Spark 4's default ANSI mode.

ANSI turns malformed string→number casts and zero divisions from
silent NULLs into JOB FAILURES — at 100 TB one dirty row must not kill
a pipeline. These tests stage deliberately dirty inputs through the
registered queries that parse data-dependent strings."""
import pyspark.sql.functions as F
import pytest


@pytest.fixture
def dirty_dir(spark, tmp_path):
    d = str(tmp_path / "sf-dirty")
    spark.createDataFrame(
        [
            # non-numeric $.k, missing k, malformed JSON, and a clean row
            (1, 1600000000000000, 10, "view", 1.0, '{"k": "oops"}'),
            (2, 1600000000500000, 10, "view", 2.0, '{"other": 1}'),
            (3, 1600000001000000, 11, "click", 3.0, "not-json"),
            (4, 1600000001500000, 11, "click", 4.0, '{"k": "7"}'),
        ],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.timestamp_micros("ts")).write.parquet(d + "/events.parquet")
    spark.createDataFrame(
        [
            # a DIGITLESS source name (regexp_extract → '' → cast fails
            # under ANSI without try_cast)
            (1, "web", "alpha beta gamma"),
            (2, "web", "delta epsilon"),
            (3, "src_3", "zeta eta theta iota"),
        ],
        "doc_id long, source string, text string",
    ).write.parquet(d + "/documents.parquet")
    return d


def test_events_json_extract_tolerates_dirty_props(spark, dirty_dir):
    from chillastic_spark.queries.engine_parity import events_json_extract

    rows = {r["event_type"]: r for r in events_json_extract(spark, dirty_dir).collect()}
    # 'view' group: both k values unparseable/missing → NULL stats
    assert rows["view"]["max_k"] is None
    # 'click' group: one dirty row NULLed, the clean "7" survives
    assert rows["click"]["max_k"] == 7


def test_mixture_weights_tolerate_digitless_source(spark, dirty_dir):
    from chillastic_spark.queries.analytics8 import domain_mixture_manifest

    rows = {
        r["source"]: r for r in domain_mixture_manifest(spark, dirty_dir).collect()
    }
    assert rows["web"]["mix_weight"] == 1  # (coalesce→0 % 4) + 1
    assert rows["src_3"]["mix_weight"] == 4  # (3 % 4) + 1


def test_value_outliers_tolerates_constant_group(spark, tmp_path):
    """A constant-valued (sd = 0) event_type group has no outliers —
    and must not DIVIDE_BY_ZERO the whole job under ANSI."""
    from chillastic_spark.queries.analytics2 import value_outliers

    d = str(tmp_path / "sf-const")
    spark.createDataFrame(
        [
            (1, 1600000000000000, 1, "const", 5.0, "{}"),
            (2, 1600000001000000, 1, "const", 5.0, "{}"),
            (3, 1600000000000000, 1, "single", 1.0, "{}"),
            # a varying group so the query still produces its shape
            *[
                (10 + i, 1600000000000000 + i, 2, "vary", float(i % 10), "{}")
                for i in range(40)
            ],
            (99, 1600000002000000, 2, "vary", 1000.0, "{}"),
        ],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.timestamp_micros("ts")).write.parquet(d + "/events.parquet")
    rows = value_outliers(spark, d).collect()
    assert all(r["event_type"] == "vary" for r in rows)
    assert any(r["event_id"] == 99 for r in rows)


def test_phrase_search_tolerates_one_token_doc(spark, tmp_path):
    """A doc whose ONLY token equals the first phrase term used to read
    element_at(w, 2) of a 1-element array — an ANSI job failure."""
    from chillastic_spark.queries.search import PHRASE, phrase_search

    d = str(tmp_path / "sf-phrase")
    spark.createDataFrame(
        [
            (1, "web", PHRASE[0]),  # lone first-term token
            (2, "web", f"a {PHRASE[0]} {PHRASE[1]} b"),
        ],
        "doc_id long, source string, text string",
    ).write.parquet(d + "/documents.parquet")
    rows = phrase_search(spark, d).collect()
    assert [(r["doc_id"], r["n_occurrences"]) for r in rows] == [(2, 1)]
