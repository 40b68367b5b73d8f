"""Structured-streaming continuous reindex: drain, exactly-once resume,
mutator application (SURVEY §2.9)."""
import json

from chillastic_spark.sources import ENVELOPE_SCHEMA
from chillastic_spark.streaming import continuous_reindex

from conftest import docs_f1

UPPER = """
TYPE = "data"
def predicate(doc, args):
    return True
def mutate(doc, args):
    doc["_source"]["someField_1"] = doc["_source"]["someField_1"].upper()
    return doc
"""


def test_stream_drains_and_resumes(spark, tmp_path, store_factory):
    src = store_factory("src", {"myindex1": docs_f1(10)})
    dst = store_factory("dst")
    ckpt = str(tmp_path / "ckpt")

    q = continuous_reindex(spark, src, "myindex1", dst, ckpt)
    q.awaitTermination(120)
    assert dst.count(spark, "myindex1") == 10

    # append 5 more docs; same checkpoint → only the new files process,
    # upsert keeps the old ones intact (exactly-once by idempotence)
    extra = [
        ("myindex1", "mytype1", f"new{i}", json.dumps({"someField_1": f"n{i}"}), 10)
        for i in range(5)
    ]
    src.write_documents(spark.createDataFrame(extra, ENVELOPE_SCHEMA), "myindex1")
    q2 = continuous_reindex(spark, src, "myindex1", dst, ckpt)
    q2.awaitTermination(120)
    assert dst.count(spark, "myindex1") == 15


def test_stream_applies_mutators(spark, tmp_path, store_factory):
    from chillastic_spark.registry import Mutators

    m = Mutators()
    m.add("upper", UPPER)
    src = store_factory("src", {"myindex1": docs_f1(3)})
    dst = store_factory("dst")
    q = continuous_reindex(
        spark, src, "myindex1", dst, str(tmp_path / "ck2"),
        mutators_by_type={"data": [m.get("upper")]},
    )
    q.awaitTermination(120)
    rows = [json.loads(r["_source"]) for r in dst.read(spark, "myindex1").collect()]
    assert all(v["someField_1"].startswith("SOMETHING") for v in rows)


def test_deduplicated_ingest_across_batches(spark, tmp_path, store_factory):
    from chillastic_spark.streaming import deduplicated_ingest

    src = store_factory("src-dd", {"idx1": docs_f1(6)})
    dst = store_factory("dst-dd")
    ckpt = str(tmp_path / "ck-dd")
    q = deduplicated_ingest(spark, src, "idx1", dst, ckpt)
    q.awaitTermination(120)
    assert dst.count(spark, "idx1") == 6

    # a later file re-delivers the same content under NEW ids plus one
    # genuinely new doc → only the new doc lands
    dupes = [
        ("idx1", "mytype1", f"redelivered{i}",
         json.dumps({"someField_1": f"something {i}"}, sort_keys=True), 10)
        for i in range(6)
    ] + [("idx1", "mytype1", "fresh", json.dumps({"someField_1": "brand new"}), 10)]
    from chillastic_spark.sources import ENVELOPE_SCHEMA as ES
    src.write_documents(spark.createDataFrame(dupes, ES), "idx1")
    q2 = deduplicated_ingest(spark, src, "idx1", dst, ckpt)
    q2.awaitTermination(120)
    assert dst.count(spark, "idx1") == 7  # 6 originals + 1 fresh


def test_stream_over_bucketed_source_ignores_scratch_dirs(spark, tmp_path, store_factory):
    """A bucketed source index streams via the strict bucket-NNNN glob:
    crash leftovers (bucket-0000.old-x with real files) are not read."""
    import shutil

    from chillastic_spark.sinks import upsert

    src = store_factory("src-b")
    dst = store_factory("dst-b")
    docs = spark.createDataFrame(
        [("bix", "t", f"d{i}", json.dumps({"someField_1": f"s{i}"}), 10)
         for i in range(12)],
        ENVELOPE_SCHEMA,
    )
    upsert(spark, src, docs, n_buckets=4)
    assert src.bucket_count("bix") == 4
    # plant a data-bearing crash leftover next to a live bucket
    live = src.bucket_paths("bix")[0]
    shutil.copytree(live, live + ".old-dead")

    q = continuous_reindex(spark, src, "bix", dst, str(tmp_path / "ckb"))
    q.awaitTermination(120)
    assert dst.count(spark, "bix") == 12  # no double reads


def test_events_stream_rejects_timestamp_typed_files(spark, tmp_path):
    """The stream contract requires raw int64 micros — a nanos/timestamp
    parquet must FAIL loudly (the batch path's session-wide nanosAsLong
    flag would otherwise let it read as long, 1000x off)."""
    import shutil

    import pytest as _pytest

    from chillastic_spark.streaming import read_events_stream

    d = tmp_path / "bad_stream"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "p0.parquet")
    with _pytest.raises(ValueError, match="int64 epoch-micros"):
        read_events_stream(spark, str(d))
