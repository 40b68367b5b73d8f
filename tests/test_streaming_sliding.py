"""Sliding-window streaming agg + stream-static enrichment join,
each checked against its batch twin on the same file."""
import pytest
from pyspark.sql import functions as F

from chillastic_spark.streaming import enriched_windowed_counts, sliding_window_rates
from chillastic_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def events_dir(tmp_path):
    """Time-ordered multi-file staging — see conftest.stage_events_stream."""
    from conftest import stage_events_stream

    return stage_events_stream(tmp_path)


def test_sliding_windows_match_batch(spark, tmp_path, events_dir):
    q = sliding_window_rates(
        spark, events_dir, str(tmp_path / "ck-slide"), query_name="slide_t1"
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in spark.sql("SELECT * FROM slide_t1").collect()
    }
    batch = (
        load(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2).alias(
                "sum_value"
            ),
        )
        .select(F.col("win.start").alias("ws"), "event_type", "cnt", "sum_value")
        .collect()
    )
    want = {(r["ws"], r["event_type"]): (r["cnt"], r["sum_value"]) for r in batch}
    # every event lands in exactly window/slide = 4 windows
    n_events = load(spark, SF_DIR, "events").count()
    assert sum(c for c, _ in want.values()) == 4 * n_events
    # append-mode emits only watermark-closed windows; everything
    # emitted must match the batch twin exactly, and nearly all windows
    # should have closed (availableNow advances the watermark to max ts)
    assert got, "stream emitted nothing"
    # at most window/slide = 4 trailing windows per event_type can
    # still be open when the watermark stops at max(ts)
    assert len(got) >= len(want) - 4 * 5
    for key, v in got.items():
        assert want[key] == v, key


def test_enriched_counts_match_batch(spark, tmp_path, events_dir):
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue")],
        "event_type string, category string",
    )
    q = enriched_windowed_counts(
        spark, events_dir, dim, str(tmp_path / "ck-enrich"), query_name="enrich_t1"
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["category"]): r["cnt"]
        for r in spark.sql("SELECT * FROM enrich_t1").collect()
    }
    batch = (
        load(spark, SF_DIR, "events")
        .join(F.broadcast(dim), "event_type", "left")
        .withColumn("category", F.coalesce("category", F.lit("other")))
        .groupBy(F.window("ts", "1 hour").alias("win"), "category")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("ws"), "category", "cnt")
        .collect()
    )
    want = {(r["ws"], r["category"]): r["cnt"] for r in batch}
    assert got, "stream emitted nothing"
    assert len(got) >= len(want) - 4
    for key, v in got.items():
        assert want[key] == v, key
    # the join actually classified: both mapped and fallback categories appear
    cats = {c for _, c in got}
    assert "other" in cats and ("engagement" in cats or "revenue" in cats)


def test_percolate_stream_matches_batch(spark, tmp_path):
    """Streaming percolator alerts must equal the batch percolate
    matches for the same stored queries over the same docs."""
    import shutil as _sh

    from chillastic_spark.queries.search2 import STORED_QUERIES
    from chillastic_spark.streaming import percolate_stream

    d = tmp_path / "docstream"
    d.mkdir()
    _sh.copy(f"{SF_DIR}/documents.parquet", d / "part-0.parquet")
    # a zero-term stored query must match NOTHING (the batch contract:
    # its postings join yields no group), not every document
    queries = dict(STORED_QUERIES, __empty=[])
    q = percolate_stream(
        spark, str(d), str(tmp_path / "ck-perc"), queries, query_name="perc_t1"
    )
    q.awaitTermination(180)
    got = {
        (r["qid"], r["doc_id"])
        for r in spark.sql("SELECT * FROM perc_t1").collect()
    }
    docs = {
        r["doc_id"]: set(r["text"].strip().split())
        for r in load(spark, SF_DIR, "documents").collect()
    }
    want = {
        (qid, did)
        for qid, terms in STORED_QUERIES.items()
        for did, toks in docs.items()
        if all(t in toks for t in terms)
    }
    assert got == want
