"""Targeted per-id delete: removes exactly the victims, idempotent."""
from pyspark.sql import functions as F

from chillastic_spark.sinks import purge, upsert
from chillastic_spark.sources import DocumentStore


def _corpus(spark, n=30):
    return spark.range(n).select(
        F.lit("idx").alias("_index"),
        F.concat(F.lit("t"), (F.col("id") % 2).cast("string")).alias("_type"),
        F.col("id").cast("string").alias("_id"),
        F.to_json(F.struct(F.col("id").alias("v"))).alias("_source"),
        F.lit(10).cast("long").alias("_size"),
    )


def test_purge_removes_only_victims_and_is_idempotent(spark, tmp_path):
    store = DocumentStore(str(tmp_path / "s"))
    upsert(spark, store, _corpus(spark))
    assert purge(spark, store, "idx", ["3", "7", "999"]) == 2
    left = {r["_id"] for r in store.read(spark, "idx").collect()}
    assert left == {str(i) for i in range(30)} - {"3", "7"}
    assert purge(spark, store, "idx", ["3", "7"]) == 0  # re-run no-op


def test_purge_scoped_to_type(spark, tmp_path):
    store = DocumentStore(str(tmp_path / "s"))
    upsert(spark, store, _corpus(spark))
    # _id 4 is t0; purging it scoped to t1 must remove nothing
    assert purge(spark, store, "idx", ["4"], type="t1") == 0
    assert purge(spark, store, "idx", ["4"], type="t0") == 1
    assert store.read(spark, "idx").count() == 29


def test_purge_accepts_dataframe_ids(spark, tmp_path):
    store = DocumentStore(str(tmp_path / "s"))
    upsert(spark, store, _corpus(spark))
    ids = spark.range(10).select(F.col("id").cast("string").alias("_id"))
    assert purge(spark, store, "idx", ids) == 10
    assert store.read(spark, "idx").count() == 20


def test_purge_flat_index_without_upsert(spark, tmp_path):
    """A never-upserted (flat-layout) index purges via whole-dir swap."""
    store = DocumentStore(str(tmp_path / "s"))
    store.write_documents(_corpus(spark, 12), "idx")
    assert store.bucket_count("idx") is None
    assert purge(spark, store, "idx", ["1", "2"]) == 2
    assert store.read(spark, "idx").count() == 10
    assert store.bucket_count("idx") is None  # purge keeps the layout
