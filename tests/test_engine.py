"""End-to-end engine tests: the reference's golden transfer/worker
integration scenarios (transfer.spec.js:333-545, worker.spec.js:64-143)
on the Spark engine."""
import json

import pytest

from pyspark.sql import functions as F

from chillastic_spark.engine import Engine, TaskError, TaskState, Transfer
from chillastic_spark.model import ActionRef, Subtask, Task, TransferSpec
from chillastic_spark.sinks import upsert
from chillastic_spark.sources import DocumentStore

from conftest import docs_f1

DATE_MUTATOR = """
TYPE = "data"
OLD = re.compile(r"^(.*)_(\\d{4}-\\d{2})-\\d{2}$")
def predicate(doc, args):
    return bool(OLD.match(doc["_index"]))
def mutate(doc, args):
    doc["_index"] = OLD.sub(r"\\1_\\2", doc["_index"])
    return doc
"""

DROP_WITH_ARGS = """
TYPE = "data"
def predicate(doc, args):
    return doc["_source"].get("field") == args["match"]
def mutate(doc, args):
    return None
"""


def _engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "state"))


def _task(src, dst, **kw):
    return Task(source=src.root, destination=dst.root,
                transfer=TransferSpec(**kw.pop("transfer", {})), **kw)


# ------------------------------------------------- golden 20-doc transfer


def test_golden_transfer_20_docs(spark, tmp_path, store_factory):
    src = store_factory("src", {"myindex1": docs_f1(20)})
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    eng.add_task("t1", _task(src, dst, transfer={"from_indices": "myindex1"}))
    status = eng.run_task("t1")
    assert status["percentComplete"] == 100.0
    assert status["completed"] == 20
    assert dst.count(spark, "myindex1") == 20
    # payload survived intact
    row = dst.read(spark, "myindex1").filter(F.col("_id") == "id7").collect()[0]
    assert json.loads(row["_source"]) == {"someField_1": "something 7"}


def test_rerun_is_idempotent(spark, tmp_path, store_factory):
    src = store_factory("src", {"myindex1": docs_f1(20)})
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    eng.add_task("t1", _task(src, dst, transfer={"from_indices": "myindex1"}))
    eng.run_task("t1")
    eng.build_backlog("t1")  # resume: completed subtasks are skipped
    status = eng.run_task("t1")
    assert dst.count(spark, "myindex1") == 20
    assert status["backlog"] == 0


def test_two_index_worker_golden(spark, tmp_path, store_factory):
    # worker.spec.js:64-143 golden: 10 + 5 docs across two indices
    src = store_factory(
        "src", {"myindex1": docs_f1(10), "myindex2": docs_f1(5, "mytype2")}
    )
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    eng.add_task("t1", _task(src, dst, transfer={"from_indices": "myindex*"}))
    status = eng.run_task("t1")
    assert status["total"] == 15
    assert status["completed"] == 15
    assert dst.count(spark, "myindex1") == 10
    assert dst.count(spark, "myindex2") == 5


def test_shared_mode_run_and_second_exclusive_writer_refused(spark, tmp_path, store_factory):
    """run_task(shared=True) drains via per-op atomic state rounds (the
    N-worker protocol) and produces the same golden result; meanwhile
    the DEFAULT mode still refuses a second concurrent writer."""
    src = store_factory(
        "src", {"myindex1": docs_f1(10), "myindex2": docs_f1(5, "mytype2")}
    )
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    eng.add_task("t1", _task(src, dst, transfer={"from_indices": "myindex*"}))
    status = eng.run_task("t1", shared=True)
    assert status["completed"] == 15
    assert dst.count(spark, "myindex1") == 10
    # exclusive-mode exclusion is still enforced against a live holder
    holder = TaskState(str(tmp_path / "state"), "t1").acquire_writer()
    try:
        other = TaskState.__new__(TaskState)  # fresh lock fd, same file
        other.__init__(str(tmp_path / "state"), "t1")
        with pytest.raises(TaskError):
            other.acquire_writer(blocking=False)
    finally:
        holder.release_writer()


# O1 index comparator (examples/comparators/indices.js re-expressed in
# sandboxed Python: dated indices sort NEWEST first, non-dated lead,
# alphabetical tie-break)
DATE_COMPARATOR = """
import re
import datetime
OLD = re.compile(r"[0-9]{4}-[0-9]{2}-[0-9]{2}$")
def _key(s):
    m = OLD.search(s)
    return datetime.datetime.strptime(m.group(0), "%Y-%m-%d") if m else None
def compare(a, b):
    ka, kb = _key(a), _key(b)
    if ka is not None and kb is not None:
        if ka != kb:
            return 1 if kb > ka else -1
        return (a > b) - (a < b)
    if ka is not None:
        return 1
    if kb is not None:
        return -1
    return (a > b) - (a < b)
"""


def test_index_comparator_orders_backlog(spark, tmp_path, store_factory):
    src = store_factory(
        "src",
        {
            "logs_2020-01-01": docs_f1(2),
            "logs_2021-06-01": docs_f1(2),
            "alpha": docs_f1(2),
        },
    )
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    state = eng.add_task(
        "t1",
        _task(src, dst, transfer={
            "from_indices": "*", "index_comparator": DATE_COMPARATOR,
        }),
    )
    order = [json.loads(sid)["index"] for sid, _ in state.data["backlog"]]
    assert order == ["alpha", "logs_2021-06-01", "logs_2020-01-01"]
    # and a broken comparator is an admission error, not a runtime one
    with pytest.raises(TaskError):
        eng.add_task(
            "t2",
            _task(src, dst, transfer={
                "from_indices": "*", "index_comparator": "compare = 3",
            }),
        )
    with pytest.raises(TaskError):  # sandbox applies to comparators too
        eng.add_task(
            "t3",
            _task(src, dst, transfer={
                "from_indices": "*",
                "index_comparator": "import os\ndef compare(a,b):\n    return 0",
            }),
        )


# ---------------------------------------------------------- data mutators


def test_date_reroute_mutator(spark, tmp_path, store_factory):
    # transfer.spec.js:487-511: something_1990-05-21 → something_1990-05
    docs = [
        {"_id": i, "_type": "sometype", "_source": {"field": f"daata{i}"}}
        for i in range(4)
    ]
    src = store_factory("src", {"something_1990-05-21": docs})
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    eng.mutators.add("indexDate", DATE_MUTATOR)
    eng.add_task(
        "t1",
        _task(
            src, dst,
            transfer={"from_indices": "something_*"},
            mutators=[ActionRef(id="indexDate")],
        ),
    )
    eng.run_task("t1")
    assert dst.count(spark, "something_1990-05") == 4
    assert dst.count(spark, "something_1990-05-21") == 0


def test_drop_mutator_with_args(spark, tmp_path, store_factory):
    # transfer.spec.js:513-545: null-mutate drops matching docs only
    docs = [
        {"_id": 1, "_source": {"field": "daata"}},
        {"_id": 2, "_source": {"field": "daata2"}},
        {"_id": 3, "_source": {"field": "daata3"}},
    ]
    src = store_factory("src", {"myindex1": docs})
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    eng.mutators.add("dropper", DROP_WITH_ARGS)
    eng.add_task(
        "t1",
        _task(
            src, dst,
            transfer={"from_indices": "myindex1"},
            mutators=[ActionRef(id="dropper", arguments={"match": "daata2"})],
        ),
    )
    eng.run_task("t1")
    remaining = {
        r["_id"] for r in dst.read(spark, "myindex1").select("_id").collect()
    }
    assert remaining == {"1", "3"}


# -------------------------------------------------- catalog (index/template)


def test_index_config_transfer_strips_nonportable(spark, tmp_path, store_factory):
    cfg = {
        "myindex1": {
            "settings": {
                "index": {
                    "number_of_shards": 3,
                    "uuid": "abc",
                    "creation_date": 123,
                    "provided_name": "myindex1",
                    "version": {"created": 6000},
                }
            },
            "mappings": {"mytype1": {}},
            "aliases": {"alias_1": {}},
            # warmers ride along like any other config blob
            # (transfer.js:364-372, transfer.spec.js:240)
            "warmers": {"warmer_1": {"types": [], "source": {"query": {"match_all": {}}}}},
        }
    }
    src = store_factory("src", {}, indices_cfg=cfg)
    dst = store_factory("dst")
    t = Transfer(spark, src, dst)
    assert t.transfer_indices("myindex*") == 1
    got = dst.get_indices("myindex1")[0]
    idx = got["settings"]["index"]
    assert idx["number_of_shards"] == 3
    for bad in ("uuid", "creation_date", "provided_name"):
        assert bad not in idx
    assert "created" not in idx.get("version", {})
    assert got["aliases"] == {"alias_1": {}}
    assert got["warmers"] == {
        "warmer_1": {"types": [], "source": {"query": {"match_all": {}}}}
    }


def test_template_transfer_excludes_system(spark, tmp_path, store_factory):
    templates = {
        "test_template": {"index_patterns": ["te*"], "settings": {"number_of_shards": 1}},
        "system_tpl": {"index_patterns": [".monitoring*"]},
    }
    src = store_factory("src", {}, templates=templates)
    dst = store_factory("dst")
    t = Transfer(spark, src, dst)
    assert t.transfer_templates("*") == 1  # system template dropped
    assert [x["name"] for x in dst.get_templates("*")] == ["test_template"]
    with pytest.raises(Exception):
        src.get_templates("nomatch*")  # none found → error (transfer.js:397)


# ------------------------------------------------------ admission/controls


def test_task_admission_validation(spark, tmp_path, store_factory):
    src = store_factory("src", {"myindex1": docs_f1(2)})
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    with pytest.raises(ValueError):
        eng.add_task("9bad id", _task(src, dst, transfer={"from_indices": "x"}))
    with pytest.raises(TaskError):  # missing mutator
        eng.add_task(
            "t1",
            _task(src, dst, transfer={"from_indices": "myindex1"},
                  mutators=[ActionRef(id="nope")]),
        )
    eng.add_task("t2", _task(src, dst, transfer={"from_indices": "myindex1"}))
    with pytest.raises(TaskError):  # duplicate
        eng.add_task("t2", _task(src, dst, transfer={"from_indices": "myindex1"}))
    assert eng.list_tasks() == ["t2"]
    eng.remove_task("t2")
    assert eng.list_tasks() == []


def test_filters_prune_planning(spark, tmp_path, store_factory):
    src = store_factory(
        "src", {"myindex1": docs_f1(3), "other1": docs_f1(3)}
    )
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    eng.filters.add(
        "onlyMy",
        "TYPE='index'\ndef predicate(index, args):\n    return index['name'].startswith('myindex')\n",
    )
    eng.add_task(
        "t1",
        _task(
            src, dst,
            transfer={"from_indices": "*", "filters": [ActionRef(id="onlyMy")]},
        ),
    )
    eng.run_task("t1")
    assert dst.count(spark, "myindex1") == 3
    assert dst.count(spark, "other1") == 0


def test_stop_halts_processing(spark, tmp_path, store_factory):
    src = store_factory("src", {"myindex1": docs_f1(5)})
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    eng.add_task("t1", _task(src, dst, transfer={"from_indices": "myindex1"}))
    eng.stop()
    status = eng.run_task("t1")
    assert status["completed"] == 0 and status["backlog"] == 5
    eng.start()
    assert eng.run_task("t1")["completed"] == 5


def test_error_logged_not_requeued(spark, tmp_path, store_factory):
    src = store_factory("src", {"myindex1": docs_f1(2)})
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    bad = "TYPE='data'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    raise RuntimeError('boom')\n"
    eng.mutators.add("boom", bad)
    eng.add_task(
        "t1",
        _task(src, dst, transfer={"from_indices": "myindex1"},
              mutators=[ActionRef(id="boom")]),
    )
    status = eng.run_task("t1")
    assert status["completed"] == 0
    assert status["backlog"] == 0  # popped, failed, NOT re-queued (worker.js:108)
    errs = eng.get_task_errors("t1")
    assert len(errs) == 1 and "boom" in errs[0]["message"]
    # backlog rebuild resurrects the failed subtask (subtasks.js:385-392)
    eng.build_backlog("t1")
    assert eng.get_task_status("t1")["backlog"] == 2


# ------------------------------------------------------------------- sink


def test_upsert_idempotent_and_updates(spark, tmp_path, store_factory):
    dst = store_factory("dst")
    from chillastic_spark.sources import ENVELOPE_SCHEMA

    batch = spark.createDataFrame(
        [("i1", "t", "a", '{"v": 1}', 8), ("i1", "t", "b", '{"v": 2}', 8)],
        ENVELOPE_SCHEMA,
    )
    assert upsert(spark, dst, batch) == 2
    assert upsert(spark, dst, batch) == 2  # re-delivery → no dups
    assert dst.count(spark, "i1") == 2
    updated = spark.createDataFrame(
        [("i1", "t", "b", '{"v": 99}', 9)], ENVELOPE_SCHEMA
    )
    upsert(spark, dst, updated)
    rows = {r["_id"]: json.loads(r["_source"]) for r in dst.read(spark, "i1").collect()}
    assert rows == {"a": {"v": 1}, "b": {"v": 99}}


def test_flush_override_and_subtask_id_roundtrip():
    s = Subtask(kind="documents", index="i", type="t", min_size=0, max_size=10,
                flush_size=50, count=7)
    s2 = Subtask.from_id(s.subtask_id(), count=7)
    assert s2 == s
    assert s.has_size_range()
    assert not Subtask(kind="documents", index="i", type="t").has_size_range()


def test_restart_preserves_index_comparator(spark, tmp_path, store_factory):
    """A restarted Engine must reload the task's index_comparator —
    silently dropping it loses the index ordering (and its
    admission-time validation) after every restart."""
    src = store_factory(
        "src", {"logs_2020-01-01": docs_f1(1), "alpha": docs_f1(1)}
    )
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    eng.add_task(
        "t1",
        _task(src, dst, transfer={
            "from_indices": "*", "index_comparator": DATE_COMPARATOR,
        }),
    )
    eng2 = _engine(spark, tmp_path)  # same state root, fresh process
    assert eng2.get_task("t1").transfer.index_comparator == DATE_COMPARATOR
    state = eng2.build_backlog("t1")
    order = [json.loads(sid)["index"] for sid, _ in state.data["backlog"]]
    assert order == ["alpha", "logs_2020-01-01"]


def test_add_task_rolls_back_on_planning_failure(spark, tmp_path, store_factory, monkeypatch):
    """A transient build_backlog failure must not half-admit the task:
    the retry must not hit 'already exists'."""
    src = store_factory("src", {"ix": docs_f1(2)})
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    orig = type(src).get_indices
    calls = {"n": 0}

    def flaky(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient 500 from the source")
        return orig(self, *a, **k)

    monkeypatch.setattr(type(src), "get_indices", flaky)
    with pytest.raises(RuntimeError):
        eng.add_task("t1", _task(src, dst, transfer={"from_indices": "ix"}))
    assert "t1" not in eng.list_tasks()
    eng2 = _engine(spark, tmp_path)
    assert "t1" not in eng2.list_tasks()  # nothing persisted either
    # retry succeeds
    state = eng.add_task("t1", _task(src, dst, transfer={"from_indices": "ix"}))
    assert len(state.data["backlog"]) == 1


def test_remove_task_refused_while_running(spark, tmp_path, store_factory):
    """remove_task fails fast when another holder has the state writer
    lock instead of racing the runner and resurrecting state files."""
    src = store_factory("src", {"ix": docs_f1(2)})
    dst = store_factory("dst")
    eng = _engine(spark, tmp_path)
    eng.add_task("t1", _task(src, dst, transfer={"from_indices": "ix"}))
    import multiprocessing as mp

    def hold(root, q):
        from chillastic_spark.engine import TaskState

        s = TaskState(root, "t1").acquire_writer()
        q.put("held")
        import time as _t

        _t.sleep(3)
        s.release_writer()

    q = mp.Queue()
    p = mp.Process(target=hold, args=(eng.state_root, q))
    p.start()
    try:
        assert q.get(timeout=10) == "held"
        with pytest.raises(TaskError, match="being written"):
            eng.remove_task("t1")
    finally:
        p.join()
    eng.remove_task("t1")  # lock released: removal proceeds
    assert "t1" not in eng.list_tasks()


def test_build_backlog_refuses_inflight_progress(spark, tmp_path, store_factory):
    """Rebuilding while subtasks are in flight would clear LIVE
    progress and re-enqueue work another process is delivering —
    refuse unless force=True (the crashed-run escape hatch)."""
    src = store_factory("src-bf", {"idx1": [
        {"_id": f"d{i}", "_type": "t", "_source": {"v": i}} for i in range(6)
    ]})
    dst = store_factory("dst-bf")
    eng = Engine(spark, str(tmp_path / "st-bf"))
    eng.add_task("t1", Task(source=src.root, destination=dst.root,
                            transfer=TransferSpec(from_indices="idx1")))
    state = TaskState(str(tmp_path / "st-bf"), "t1")
    state.data["progress"]["doc:idx1:0"] = {"ts": 1}
    state.save()
    with pytest.raises(TaskError, match="in-flight"):
        eng.build_backlog("t1")
    eng.build_backlog("t1", force=True)  # crashed-run override


def test_removed_task_state_is_not_resurrected(spark, tmp_path):
    """A shared-mode worker whose state file was deleted by
    remove_task must ABORT its next state op, not re-save the stale
    in-memory copy as an orphan task file."""
    import os

    root = str(tmp_path / "st-rm")
    s1 = TaskState(root, "tx")
    s1.data["total"] = 5
    s1.save()
    s2 = TaskState(root, "tx")  # the running worker's handle
    os.remove(s1.path)  # remove_task deleted it mid-run
    with pytest.raises(TaskError, match="removed"):
        s2.log_error(None, "boom")  # shared-mode atomic op
    assert not os.path.exists(s1.path)  # nothing resurrected
