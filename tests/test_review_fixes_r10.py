"""Round-10 review fixes, each pinned by a regression test:

1. Shared-mode FileLock (LOCK_SH): readers coexist, and either side
   blocks the other kind — the primitive under the index reader
   guards (r9 verdict #4; the multiprocess proof lives in
   test_index_reader_race.py).
2. build_ivf_index persists ``dropped_rows`` in ivf_meta.json — a
   mixed-width corpus losing index rows is dashboard-visible (r9
   verdict #3), not only a DROP_COUNTERS log line.
3. The dedup hot-gram preflight records EVERY verdict (hot or benign)
   in dedup.PREFLIGHT_VERDICTS, and store_health_report /
   index_health / GET /indexes/health surface it together with the
   ANN drop counters (r9 verdict #3).
4. update_vector_index returns per-batch ``n_added`` without
   persisting it into meta.json.
5. The amortized preflight (r9 verdict #5) keeps semantics: capped
   path still skips the guard, uncapped results are unchanged with
   the guard on or off.
"""
import json
import os
import warnings

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------- 1. shared flock


def test_shared_locks_coexist_and_block_exclusive(tmp_path):
    from chillastic_spark.locks import FileLock, LockHeld

    path = str(tmp_path / "x.lock")
    a = FileLock(path, shared=True).acquire()
    # a second shared holder gets in while the first holds
    b = FileLock(path, shared=True).acquire()
    # an exclusive prober fails fast against shared holders
    with pytest.raises(LockHeld):
        FileLock(path).acquire(blocking=False)
    a.release()
    with pytest.raises(LockHeld):
        FileLock(path).acquire(blocking=False)
    b.release()
    ex = FileLock(path).acquire()
    # and a shared prober fails fast against an exclusive holder
    with pytest.raises(LockHeld):
        FileLock(path, shared=True).acquire(blocking=False)
    ex.release()


# ------------------------------------- 2. dropped_rows in the IVF meta


def _mixed_width(spark):
    rows = [(i, [float(i % 7) + 0.25, float(i % 5), 1.0, 0.5]) for i in range(60)]
    rows += [(1000 + i, [1.0, 2.0]) for i in range(5)]  # off-width
    rows += [(2000, None)]  # NULL vector
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_build_ivf_index_persists_dropped_rows(spark, tmp_path):
    from chillastic_spark.sources.vector_index import IVF_META, build_ivf_index

    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(_mixed_width(spark), idx, n_cells=4)
    # 5 off-width + 1 NULL cannot live in any cell
    assert meta["dropped_rows"] == 6
    assert meta["n_vectors"] == 60
    with open(os.path.join(idx, IVF_META)) as f:
        assert json.load(f)["dropped_rows"] == 6


def test_build_ivf_index_clean_corpus_drops_zero(spark, tmp_path):
    from chillastic_spark.sources.vector_index import build_ivf_index

    rows = [(i, [float(i % 7) + 0.25, float(i % 5), 1.0, 0.5]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    meta = build_ivf_index(df, str(tmp_path / "ivf"), n_cells=4)
    assert meta["dropped_rows"] == 0
    assert meta["n_vectors"] == 50


# ------------------------- 3. preflight verdicts + health-report wiring


def test_preflight_verdict_recorded_benign_and_hot(spark):
    from chillastic_spark.operators import dedup as D

    benign = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i} delta{i} eps{i}") for i in range(30)],
        "doc_id long, text string",
    )
    D.PREFLIGHT_VERDICTS.clear()
    with warnings.catch_warnings():
        warnings.simplefilter("error", D.HotGramSkewWarning)
        D.ngram_jaccard_pairs(benign, n=2, threshold=0.01).count()
    assert len(D.PREFLIGHT_VERDICTS) == 1
    v = D.PREFLIGHT_VERDICTS[-1]
    assert v["triggered"] is False and v["n_docs"] == 30

    hot = spark.createDataFrame(
        [(i, "same boiler plate trailer " + f"unique{i} tok{i}") for i in range(30)],
        "doc_id long, text string",
    )
    with pytest.warns(D.HotGramSkewWarning):
        D.ngram_jaccard_pairs(hot, n=2, threshold=0.9).count()
    v = D.PREFLIGHT_VERDICTS[-1]
    assert v["triggered"] is True
    assert v["hot_gram_doc_frac"] == 1.0  # the boilerplate gram is in every doc


def test_store_health_report_engine_section(spark, store_factory):
    from chillastic_spark.sources.maintenance import store_health_report

    store = store_factory(
        "health-eng",
        {"idx1": [{"_id": "a", "_type": "t", "_source": {"v": 1}}]},
    )
    rep = store_health_report(store)
    assert "idx1" in rep  # per-index rows unchanged
    eng = rep["_engine"]
    assert "ann_dropped_rows" in eng
    assert isinstance(eng["dedup_hot_gram_preflight"], list)


def test_index_health_and_api_endpoint(spark, tmp_path):
    from chillastic_spark.api import create_app
    from chillastic_spark.engine import Engine
    from chillastic_spark.sources.maintenance import index_health
    from chillastic_spark.sources.vector_index import (
        build_ivf_index,
        build_vector_index,
    )

    idx = str(tmp_path / "both")
    build_vector_index(_mixed_width(spark), idx, planes=3, seed="h")
    build_ivf_index(_mixed_width(spark), idx, n_cells=4)

    h = index_health(idx)
    assert h["exists"] and h["pending_swap_journal"] is False
    assert h["lsh"]["n_buckets"] == 8 and h["lsh"]["files"]["n_files"] >= 1
    assert h["ivf"]["dropped_rows"] == 6
    assert "centroids" not in h["ivf"]  # the model is not a health stat

    eng = Engine(spark, str(tmp_path / "st"))
    client = create_app(eng).test_client()
    assert client.get("/indexes/health").status_code == 400
    assert (
        client.get("/indexes/health?dir=/nonexistent-xyz").status_code == 404
    )
    resp = client.get(f"/indexes/health?dir={idx}")
    assert resp.status_code == 200
    body = resp.get_json()
    assert body["ivf"]["dropped_rows"] == 6
    assert "ann_dropped_rows" in body["_engine"]
    assert isinstance(body["_engine"]["dedup_hot_gram_preflight"], list)


# ------------------------------------------ 4. update returns n_added


def test_update_vector_index_returns_n_added(spark, tmp_path):
    from chillastic_spark.sources.vector_index import (
        _meta,
        build_vector_index,
        update_vector_index,
    )

    idx = str(tmp_path / "vi")
    rows = [(i, [float(i % 3), 1.0, 0.5, 0.25]) for i in range(20)]
    build_vector_index(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        idx,
        planes=3,
    )
    batch = spark.createDataFrame(
        [(100 + i, [1.0, float(i % 2), 0.5, 0.25]) for i in range(7)],
        "vec_id long, embedding array<double>",
    )
    ret = update_vector_index(batch, idx)
    assert ret["n_added"] == 7 and ret["n_vectors"] == 27
    # per-batch counter must NOT persist into the corpus meta
    assert "n_added" not in _meta(idx)
    # idempotent redelivery: skip mode adds nothing, says so
    ret2 = update_vector_index(batch, idx, on_existing="skip")
    assert ret2["n_added"] == 0 and ret2["n_vectors"] == 27


# ------------------------- 5. amortized preflight: semantics unchanged


def test_preflight_on_off_same_results(spark, monkeypatch):
    from chillastic_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            (i, f"shared core tokens here plus unique{i} tail{i % 4}")
            for i in range(40)
        ],
        "doc_id long, text string",
    )

    def pairs():
        return sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in D.ngram_jaccard_pairs(
                docs, n=2, threshold=0.05
            ).collect()
        )

    monkeypatch.setenv("CHILLASTIC_HOT_GRAM_PREFLIGHT", "1")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", D.HotGramSkewWarning)
        on = pairs()
    monkeypatch.setenv("CHILLASTIC_HOT_GRAM_PREFLIGHT", "0")
    off = pairs()
    assert on == off and len(on) > 0
