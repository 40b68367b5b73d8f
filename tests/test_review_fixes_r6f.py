"""Regression tests for the round-6 streaming/pipeline deep review:

1. stream_path resolved the layout once: a flat source index migrated
   to the bucketed layout by any upsert left a running (or resumed)
   stream silently blind — file streams never list files under
   unmatched subdirectories.
2. deduplicated_ingest collapsed every NULL-_source envelope into one
   content group (fingerprint(NULL) is NULL; dropDuplicates groups
   NULL keys) — distinct metadata-only docs were dropped forever.
3. continuous_index_update's dropDuplicates(["doc_id"]) silently
   indexed an arbitrary version when one trigger carried the same id
   with different text, bypassing update_inverted_index's error.
4. pipelines.curate made a NULL-id row the dedup keeper (NULLs sort
   first), dropping the real-id duplicate.
5. curate now releases its superseded pins and returns the LSH pair
   list on the report so assemble can reuse it.
"""
import os

import pytest
from pyspark.sql import functions as F

ENV = "_index string, _type string, _id string, _source string, _size long"


def test_stream_survives_flat_to_bucketed_migration(spark, tmp_path):
    from chillastic_spark.sinks import upsert
    from chillastic_spark.sources import DocumentStore
    from chillastic_spark.streaming import continuous_reindex

    src = DocumentStore(str(tmp_path / "src"))
    dst = DocumentStore(str(tmp_path / "dst"))
    ckpt = str(tmp_path / "ckpt")
    flat = spark.createDataFrame(
        [("ix", "d", f"a{i}", '{"v": 1}', None) for i in range(5)], ENV
    )
    src.write_documents(flat, "ix", mode="append")
    assert src.bucket_count("ix") is None  # flat layout

    q = continuous_reindex(spark, src, "ix", dst, ckpt, available_now=True)
    q.awaitTermination(120)
    assert dst.read(spark, "ix").count() == 5

    # migrate the SOURCE to bucketed via an upsert of new docs
    more = spark.createDataFrame(
        [("ix", "d", f"b{i}", '{"v": 2}', None) for i in range(4)], ENV
    )
    upsert(spark, src, more, n_buckets=4)
    assert src.bucket_count("ix") == 4  # migrated

    # a resumed stream (same checkpoint) must SEE the post-migration
    # rows — the old layout-pinned path listed nothing new, forever
    q2 = continuous_reindex(spark, src, "ix", dst, ckpt, available_now=True)
    q2.awaitTermination(120)
    got = {r["_id"] for r in dst.read(spark, "ix").collect()}
    assert {f"b{i}" for i in range(4)} <= got, got
    # migration double-delivery is absorbed by the idempotent MERGE
    assert dst.read(spark, "ix").count() == 9


def test_deduplicated_ingest_keeps_distinct_null_source_docs(spark, tmp_path):
    from chillastic_spark.sources import DocumentStore
    from chillastic_spark.streaming import deduplicated_ingest

    src = DocumentStore(str(tmp_path / "src"))
    dst = DocumentStore(str(tmp_path / "dst"))
    rows = [
        ("ix", "d", "m1", None, None),   # metadata-only docs:
        ("ix", "d", "m2", None, None),   # distinct ids, no _source
        ("ix", "d", "c1", '{"x": 1}', None),
        ("ix", "d", "c2", '{"x": 1}', None),  # content dup of c1
    ]
    src.write_documents(spark.createDataFrame(rows, ENV), "ix", mode="append")
    q = deduplicated_ingest(
        spark, src, "ix", dst, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    got = {r["_id"] for r in dst.read(spark, "ix").collect()}
    assert {"m1", "m2"} <= got, got       # BOTH null-source docs kept
    assert len({"c1", "c2"} & got) == 1   # content dedup still works


def test_index_update_stream_rejects_conflicting_versions(spark, tmp_path):
    from chillastic_spark.sources.search_index import build_inverted_index
    from chillastic_spark.streaming import continuous_index_update

    docs_dir = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "version one"), (1, "version two")], "doc_id long, text string"
    ).coalesce(1).write.parquet(docs_dir)
    # the stream folds into an EXISTING index (r7: the clash contract
    # lives solely in update_inverted_index, which reads the index
    # stats before validating the batch) — bootstrap an empty one
    idx = str(tmp_path / "idx")
    build_inverted_index(
        spark,
        spark.createDataFrame([], "doc_id long, text string"),
        idx,
    )
    q = continuous_index_update(spark, docs_dir, idx, str(tmp_path / "ckpt"))
    with pytest.raises(Exception, match="different text|resolve upstream"):
        q.awaitTermination(120)
        raise RuntimeError(q.exception() or "stream succeeded unexpectedly")


def test_curate_null_id_never_wins_keeper(spark):
    from chillastic_spark.pipelines import CurationConfig, curate

    df = spark.createDataFrame(
        [
            (None, "the quick brown fox jumps over the lazy dog again", "s1"),
            (7, "the quick brown fox jumps over the lazy dog again", "s1"),
            (8, "a completely different document with many unique tokens here", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    cfg = CurationConfig(scrub=False, min_quality=0.0, min_tokens=1)
    chunks, report = curate(df, cfg)
    ids = {r.doc_id for r in chunks.select("doc_id").distinct().collect()}
    assert 7 in ids and None not in ids, ids
    assert report.after_exact_dedup == 2
    # the LSH pair list rides on the report for assemble to reuse
    assert report.near_dup_pairs is not None
    assert "near_dup_pairs" not in report.as_dict()
