"""Regression tests for the round-6 store/engine deep review:

1. write_documents' flat path wrote with no locks (racing the merge's
   flat->bucketed migration) and its bucketed append never healed an
   interrupted swap first — re-creating a live bucket whose only copy
   sat in .old-, which the next heal then deleted permanently.
2. types_of_config misclassified typeless mappings carrying top-level
   '_size' (mapper-size plugin) / 'subobjects' as TYPED — planning
   type='_size' subtasks that transfer zero documents.
3. add_task's failed-planning cleanup only popped memory: a concurrent
   _save_tasks could have persisted the still-planning task, and the
   next merge-fold resurrected it ('already exists' forever, no
   backlog).
4. ESStore.purge coerced NULL _id victims to the string 'None' —
   deleting an unrelated doc literally named "None"; DeltaStore's list
   path shared the coercion.
5. ann_query_index / ann_query_ivf_index crashed on a bootstrap-empty
   index (partitionBy writes leave no schema-bearing files) instead of
   returning empty results.
6. set_bucket_count accepted n >= 10000, writing bucket dirs the
   4-digit stream glob silently never reads.
7. store_health_report counted crash leftovers (.old-/.compact- dirs)
   as live files, flipping needs_compaction on healthy indexes.
8. vector-index compaction swaps now run under a writer lock with a
   journal (covered in test_vector_index.py's recovery test).
"""
import json
import os

import pytest

SF = "/root/testdata/sf0.001"


def test_types_of_config_typeless_with_size_plugin():
    from chillastic_spark.sources import types_of_config

    cfg = {
        "mappings": {
            "_size": {"enabled": True},
            "properties": {"f": {"type": "keyword"}},
        }
    }
    types = types_of_config(cfg)
    assert len(types) == 1 and types[0]["name"] is None, types
    cfg8 = {"mappings": {"subobjects": False, "properties": {}}}
    assert types_of_config(cfg8)[0]["name"] is None
    # a genuinely TYPED config still yields its type names
    typed = {"mappings": {"doc_a": {"properties": {}}}}
    assert [t["name"] for t in types_of_config(typed)] == ["doc_a"]


def test_set_bucket_count_rejects_unstreamable_counts(tmp_path):
    from chillastic_spark.sources import DocumentStore, StoreError

    store = DocumentStore(str(tmp_path / "s"))
    for bad in (0, -1, 10000):
        with pytest.raises(StoreError, match="9999"):
            store.set_bucket_count("ix", bad)
    store.set_bucket_count("ix", 32)
    assert store.bucket_count("ix") == 32


def test_bucketed_append_heals_interrupted_swap_first(spark, tmp_path):
    """A crashed upsert left bucket-NNNN only as .old-; a raw append
    must restore it rather than re-create an empty live dir (whose
    existence would make the next heal DELETE the .old- copy)."""
    import shutil

    from chillastic_spark.sources import DocumentStore

    store = DocumentStore(str(tmp_path / "s"))
    df = spark.createDataFrame(
        [("ix", "d", str(i), "{}", None) for i in range(40)],
        "_index string, _type string, _id string, _source string, _size long",
    )
    store.set_bucket_count("ix", 4)
    store.write_documents(df, "ix", mode="append")
    before = store.read(spark, "ix").count()
    assert before == 40
    # simulate the crash window: one bucket renamed to .old-, live gone
    victims = store.bucket_paths("ix")
    b0 = victims[0]
    os.rename(b0, b0 + ".old-ab12cd34")
    assert not os.path.exists(b0)
    # a raw append of 1 new row must first restore the bucket
    one = spark.createDataFrame(
        [("ix", "d", "extra", "{}", None)],
        "_index string, _type string, _id string, _source string, _size long",
    )
    store.write_documents(one, "ix", mode="append")
    assert store.read(spark, "ix").count() == 41  # nothing lost
    assert not os.path.exists(b0 + ".old-ab12cd34")


def test_failed_planning_does_not_resurrect_from_disk(tmp_path, spark):
    """Simulate the concurrent-persist window: the task lands in
    tasks.json while planning is in flight, planning fails — the id
    must be re-admittable, not 'already exists' forever."""
    from chillastic_spark.engine import Engine, TaskError
    from chillastic_spark.model import Task, TransferSpec

    state = str(tmp_path / "state")
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    for p in (src, dst):
        os.makedirs(os.path.join(p, "data"))
        os.makedirs(os.path.join(p, "catalog"))
    eng = Engine(spark, state_root=state)
    bad = Task(
        source=src, destination=dst, transfer=TransferSpec(from_indices="*")
    )
    real_build = eng._build_backlog_locked

    def failing_build(task, state, force=False):
        # the concurrent replica persists the task table (including the
        # still-planning task) DURING planning...
        with eng._mutex:
            eng._save_tasks()
        # ...and then planning fails (source 500 analog). (r7: admission
        # plans via _build_backlog_locked under the reservation flock,
        # so that is the seam to fail.)
        raise RuntimeError("source listing 500")

    eng._build_backlog_locked = failing_build
    with pytest.raises((TaskError, RuntimeError)):
        eng.add_task("trace1", bad)
    eng._build_backlog_locked = real_build
    # the id must not linger anywhere — memory, task table, or disk
    assert "trace1" not in eng.list_tasks()
    tasks_path = os.path.join(state, "tasks.json")
    if os.path.exists(tasks_path):
        assert "trace1" not in json.load(open(tasks_path))
    # and a later valid admission of the same id works
    ok = Task(
        source=src, destination=dst, transfer=TransferSpec(from_indices="*")
    )
    eng.add_task("trace1", ok)
    assert "trace1" in eng.list_tasks()


def test_es_purge_skips_null_ids(tmp_path, spark):
    """A NULL _id victim must match nothing — not the literal doc
    _id='None'."""
    from es_fixture import FakeES

    from chillastic_spark.sources.es_rest import ESStore

    es = FakeES()
    url = es.start()
    try:
        es.seed("ix", "d", {"None": {"x": 1}, "keep": {"x": 2}})
        store = ESStore(url)
        deleted = store.purge(spark, "ix", [None])
        assert deleted == 0  # the doc literally named 'None' survives
        assert set(es.contents("ix")) == {"None", "keep"}
    finally:
        es.stop()


def test_ann_query_on_bootstrap_empty_index(spark, tmp_path):
    from chillastic_spark.sources.vector_index import (
        ann_query_index,
        build_vector_index,
    )

    idx = str(tmp_path / "vidx")
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    build_vector_index(empty, idx, planes=4)
    q = spark.createDataFrame(
        [(1, [0.1] * 8)], "query_id long, embedding array<float>"
    )
    got = ann_query_index(spark, idx, q, k=3).collect()
    assert got == []


def test_ivf_query_on_bootstrap_empty_index(spark, tmp_path):
    """build_ivf_index refuses an empty corpus, but a hand-rolled /
    damaged meta with no centroids must serve empty results, not crash
    in the numpy probe matmul."""
    from chillastic_spark.sources.vector_index import IVF_META, ann_query_ivf_index

    idx = str(tmp_path / "ivf")
    os.makedirs(idx)
    with open(os.path.join(idx, IVF_META), "w") as f:
        json.dump({"centroids": [], "n_cells": 0}, f)
    q = spark.createDataFrame(
        [(1, [0.1] * 8)], "query_id long, embedding array<float>"
    )
    got = ann_query_ivf_index(spark, idx, q, k=3).collect()
    assert got == []


def test_health_report_ignores_crash_leftovers(spark, tmp_path):
    import shutil

    from chillastic_spark.sources import DocumentStore
    from chillastic_spark.sources.maintenance import file_stats

    store = DocumentStore(str(tmp_path / "s"))
    df = spark.createDataFrame(
        [("ix", "d", str(i), "{}", None) for i in range(10)],
        "_index string, _type string, _id string, _source string, _size long",
    )
    store.write_documents(df, "ix", mode="append")
    base = file_stats(store.index_path("ix"))
    # park a full copy as a crash leftover
    leftover = store.index_path("ix") + "/junk.compact-ab12"
    os.makedirs(os.path.dirname(leftover), exist_ok=True)
    shutil.copytree(store.index_path("ix"), leftover,
                    ignore=shutil.ignore_patterns("junk.compact-*"))
    after = file_stats(store.index_path("ix"))
    assert after["n_files"] == base["n_files"], (base, after)
