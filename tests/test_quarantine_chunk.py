"""Quarantine side-channel, round-robin execution, chunking operator."""
import json

from pyspark.sql import functions as F

from chillastic_spark.operators.chunking import chunk_documents
from chillastic_spark.operators.mutate import QUARANTINE_INDEX, apply_data_mutators
from chillastic_spark.sources import ENVELOPE_SCHEMA


class Mut:
    def __init__(self, pred, mut):
        self.predicate, self.mutate, self.arguments = pred, mut, None


def _docs(spark, n=4):
    rows = [("i1", "t", str(i), json.dumps({"v": i}), 10) for i in range(n)]
    return spark.createDataFrame(rows, ENVELOPE_SCHEMA)


def test_quarantine_routes_bad_docs(spark):
    def boom(d, a):
        if d["_source"]["v"] == 2:
            raise ValueError("bad doc")
        d["_source"]["v"] *= 10
        return d

    out = apply_data_mutators(
        _docs(spark), [Mut(lambda d, a: True, boom)], quarantine=True
    ).collect()
    by_index = {}
    for r in out:
        by_index.setdefault(r["_index"], []).append(r)
    assert len(by_index["i1"]) == 3  # good docs mutated
    assert {json.loads(r["_source"])["v"] for r in by_index["i1"]} == {0, 10, 30}
    q = by_index[QUARANTINE_INDEX]
    assert len(q) == 1
    payload = json.loads(q[0]["_source"])
    assert "bad doc" in payload["error"]
    assert payload["original_index"] == "i1"
    assert q[0]["_id"] == "i1/2"  # original identity preserved


def test_without_quarantine_propagates(spark):
    def boom(d, a):
        raise ValueError("explode")

    import pytest

    with pytest.raises(Exception):
        apply_data_mutators(_docs(spark), [Mut(lambda d, a: True, boom)]).collect()


def test_run_all_round_robin(spark, tmp_path, store_factory):
    from chillastic_spark.engine import Engine
    from chillastic_spark.model import Task, TransferSpec

    from conftest import docs_f1

    src = store_factory("src", {"idxa": docs_f1(4), "idxb": docs_f1(6, "t2")})
    dst = store_factory("dst")
    eng = Engine(spark, str(tmp_path / "state"))
    for tid, pat in (("taskA", "idxa"), ("taskB", "idxb")):
        eng.add_task(tid, Task(source=src.root, destination=dst.root,
                               transfer=TransferSpec(from_indices=pat)))
    status = eng.run_all()
    assert status["tasks"]["taskA"]["percentComplete"] == 100.0
    assert status["tasks"]["taskB"]["percentComplete"] == 100.0
    assert dst.count(spark, "idxa") == 4 and dst.count(spark, "idxb") == 6


def test_chunking_windows(spark):
    text90 = " ".join(f"w{i}" for i in range(90))
    text50 = " ".join(f"w{i}" for i in range(50))
    text5 = "a b c d e"
    df = spark.createDataFrame(
        [(1, text90), (2, text50), (3, text5)], "doc_id: long, text: string"
    )
    got = chunk_documents(df, size=50, stride=40).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 90 tokens → 2 windows: [0..49], [40..89]
    assert [r["n_chunk_tokens"] for r in sorted(by_doc[1], key=lambda r: r["chunk_idx"])] == [50, 50]
    assert by_doc[1][0]["chunk_text"].split()[0] == "w0"
    assert sorted(by_doc[1], key=lambda r: r["chunk_idx"])[1]["chunk_text"].split()[0] == "w40"
    # exactly 50 → one window; 5 tokens → one short window
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 50
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_chunk_tokens"] == 5
    # every token of doc1 appears in at least one chunk
    covered = set()
    for r in by_doc[1]:
        covered.update(r["chunk_text"].split())
    assert covered == set(text90.split())


def test_quarantine_absorbs_malformed_source_json(spark):
    """A corrupt _source string is per-record bad data: it must route
    to _quarantine like a mutator failure, not kill the whole slice
    (the decode used to run OUTSIDE the guard)."""
    rows = [
        ("i1", "t", "0", json.dumps({"v": 0}), 10),
        ("i1", "t", "1", '{"v": 1, TRUNCATED', 10),  # corrupt JSON
    ]
    df = spark.createDataFrame(rows, ENVELOPE_SCHEMA)
    out = apply_data_mutators(
        df, [Mut(lambda d, a: True, lambda d, a: d)], quarantine=True
    ).collect()
    by_index = {}
    for r in out:
        by_index.setdefault(r["_index"], []).append(r)
    assert len(by_index["i1"]) == 1
    q = by_index[QUARANTINE_INDEX]
    assert len(q) == 1
    payload = json.loads(q[0]["_source"])
    assert payload["original_source"].startswith('{"v": 1, TRUNCATED')


def test_quarantined_rows_deliver_to_an_es_destination(spark):
    """The quarantine index name must be valid on an ES destination
    (names with a leading underscore are rejected) — the side-channel
    must never be the thing that kills the bulk delivery."""
    from chillastic_spark.sources.es_rest import bulk_upsert
    from es_fixture import FakeES

    def boom(d, a):
        if d["_source"]["v"] == 1:
            raise ValueError("poison")
        return d

    out = apply_data_mutators(
        _docs(spark, 3), [Mut(lambda d, a: True, boom)], quarantine=True
    )
    assert not QUARANTINE_INDEX.startswith(("_", "-", "+"))
    assert QUARANTINE_INDEX == QUARANTINE_INDEX.lower()
    es = FakeES()
    url = es.start()
    try:
        delivered = bulk_upsert(out, url)
        assert delivered == 3
        assert len(es.contents("i1")) == 2
        quarantined = es.contents(QUARANTINE_INDEX)
        assert len(quarantined) == 1
    finally:
        es.stop()
