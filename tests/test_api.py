"""HTTP control-plane tests (mirrors tests/routes.it.spec.js via the
Flask test client)."""
import pytest

from chillastic_spark.api import create_app
from chillastic_spark.engine import Engine

from conftest import docs_f1

MUTATOR = "TYPE='data'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    return d\n"


@pytest.fixture
def client(spark, tmp_path, store_factory):
    src = store_factory("src", {"myindex1": docs_f1(5)})
    dst = store_factory("dst")
    eng = Engine(spark, str(tmp_path / "state"))
    app = create_app(eng)
    app.config["TESTING"] = True
    return app.test_client(), src, dst


def test_task_lifecycle_over_http(spark, client):
    c, src, dst = client
    body = {
        "source": src.root,
        "destination": dst.root,
        "transfer": {"documents": {"fromIndices": "myindex*"}},
    }
    r = c.post("/tasks/job1", json=body)
    assert r.status_code == 200
    assert r.get_json()["backlog"] == 5

    r = c.get("/tasks/job1")
    assert r.get_json()["percentComplete"] == 0.0

    r = c.post("/tasks/job1/_run")
    assert r.get_json()["percentComplete"] == 100.0
    assert dst.count(spark, "myindex1") == 5

    assert "job1" in c.get("/tasks").get_json()
    assert c.get("/tasks/job1/errors").get_json() == []
    c.delete("/tasks/job1")
    assert c.get("/tasks").get_json() == {}


def test_run_accepts_workers_and_shared_params(spark, client):
    c, src, dst = client
    body = {
        "source": src.root,
        "destination": dst.root,
        "transfer": {"documents": {"fromIndices": "myindex*"}},
    }
    assert c.post("/tasks/job2", json=body).status_code == 200
    r = c.post("/tasks/job2/_run?workers=2&shared=true")
    assert r.get_json()["percentComplete"] == 100.0
    assert dst.count(spark, "myindex1") == 5


def test_admission_failures_over_http(client):
    c, src, dst = client
    # bad id (regex)   routes.it.spec.js:13-68
    r = c.post("/tasks/9bad", json={"source": src.root, "destination": dst.root,
                                    "transfer": {"documents": {"fromIndices": "x"}}})
    assert r.status_code == 400
    # missing mutator
    r = c.post("/tasks/ok1", json={
        "source": src.root, "destination": dst.root,
        "transfer": {"documents": {"fromIndices": "x"}},
        "mutators": [{"id": "missing"}],
    })
    assert r.status_code == 400 and "missing" in r.get_json()["error"]
    # unreachable store
    r = c.post("/tasks/ok2", json={"source": "/nope", "destination": dst.root,
                                   "transfer": {"documents": {"fromIndices": "x"}}})
    assert r.status_code == 400
    # unknown task status
    assert c.get("/tasks/ghost").status_code == 400


def test_code_registration_refused_without_auth(client):
    """An unauthenticated API must refuse exec()-able code strings —
    default-open would be remote code execution (registry docstring)."""
    c, _, _ = client
    assert c.post("/mutators/global/myMut", data=MUTATOR).status_code == 403
    assert c.post(
        "/filters/global/f1", data="TYPE='index'\ndef predicate(i,a):\n    return True\n"
    ).status_code == 403


def test_registry_crud_over_http(spark, tmp_path, store_factory):
    eng = Engine(spark, str(tmp_path / "state-crud"))
    app = create_app(eng, api_key=None, allow_code_registration=True)
    app.config["TESTING"] = True
    c = app.test_client()
    r = c.post("/mutators/global/myMut", data=MUTATOR)
    assert r.status_code == 200
    assert c.get("/mutators/global/myMut").get_json()["type"] == "data"
    assert c.get("/mutators").get_json() == ["global/myMut"]
    # invalid source rejected
    assert c.post("/mutators/global/bad", data="not python ((").status_code == 400
    c.delete("/mutators/global/myMut")
    assert c.get("/mutators").get_json() == []
    # filters too
    assert c.post(
        "/filters/global/f1",
        data="TYPE='index'\ndef predicate(i,a):\n    return True\n",
    ).status_code == 200
    assert c.get("/filters/global/f1").get_json()["type"] == "index"


def test_start_stop_and_status(client):
    c, _, _ = client
    assert c.get("/").get_json()["manager"] == "running"
    c.post("/_stop")
    assert c.get("/").get_json()["manager"] == "stopped"
    c.post("/_start")
    assert c.get("/").get_json()["manager"] == "running"


def test_api_key_auth(spark, tmp_path, store_factory):
    eng = Engine(spark, str(tmp_path / "state-auth"))
    app = create_app(eng, api_key="sekrit")
    c = app.test_client()
    assert c.get("/").status_code == 401
    assert c.get("/", headers={"api_key": "wrong"}).status_code == 401
    # non-ASCII header must 401, not 500 (str compare_digest raises
    # TypeError on non-ASCII — the comparison runs on bytes)
    assert c.get("/", headers={"api_key": "café"}).status_code == 401
    assert c.get("/", headers={"api_key": "sekrit"}).status_code == 200


def test_search_endpoint_serves_index(spark, tmp_path, store_factory):
    from chillastic_spark.queries.search import TERMS, bm25_topk
    from chillastic_spark.sources.search_index import build_inverted_index
    from chillastic_spark.tables import load

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "apidx")
    build_inverted_index(spark, load(spark, sf, "documents"), idx)
    eng = Engine(spark, str(tmp_path / "state-s"))
    app = create_app(eng, search_index_dir=idx)
    app.config["TESTING"] = True
    c = app.test_client()

    # BM25 over the wire must equal the scan-time query
    r = c.get("/search?terms=" + ",".join(TERMS) + "&k=20")
    assert r.status_code == 200
    hits = r.get_json()["hits"]
    want = bm25_topk(spark, sf).collect()
    assert [(h["doc_id"], h["bm25"]) for h in hits] == [
        (w["doc_id"], w["bm25"]) for w in want
    ]

    r = c.get("/search?prefix=sc&k=5")
    assert r.status_code == 200
    assert len(r.get_json()["hits"]) == 5

    r = c.get("/search?suggest=sc")
    sugg = r.get_json()["suggest"]
    assert sugg and all(t.startswith("sc") for t in sugg)

    r = c.get("/search")
    assert r.status_code == 400

    app2 = create_app(eng)
    app2.config["TESTING"] = True
    assert app2.test_client().get("/search?terms=x").status_code == 400


def test_store_health_endpoint(spark, tmp_path, store_factory):
    from chillastic_spark.api import create_app
    from chillastic_spark.engine import Engine

    store = store_factory("health-api", {"idx1": [
        {"_id": "a", "_type": "t", "_source": {"v": 1}}
    ]})
    eng = Engine(spark, str(tmp_path / "st-health"))
    app = create_app(eng)
    client = app.test_client()
    assert client.get("/stores/health").status_code == 400
    assert client.get("/stores/health?path=/nonexistent").status_code == 404
    resp = client.get(f"/stores/health?path={store.root}")
    assert resp.status_code == 200
    body = resp.get_json()
    assert "idx1" in body and body["idx1"]["n_files"] >= 1


def test_vector_search_endpoint(spark, tmp_path):
    import pyspark.sql.functions as F

    from chillastic_spark.api import create_app
    from chillastic_spark.engine import Engine
    from chillastic_spark.sources.vector_index import build_vector_index
    from chillastic_spark.tables import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    idx = str(tmp_path / "vidx-api")
    build_vector_index(e, idx, planes=5)
    eng = Engine(spark, str(tmp_path / "st-vec"))
    app = create_app(eng, vector_index_dir=idx)
    client = app.test_client()
    probe = e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    resp = client.post(
        "/vectors/_search", json={"vector": [float(x) for x in probe], "k": 5}
    )
    assert resp.status_code == 200
    hits = resp.get_json()["hits"]
    assert 0 < len(hits) <= 5
    # ranked by cosine desc; the probe vector itself (vec_id 0) ranks top
    assert hits[0]["vec_id"] == 0 and hits[0]["cos"] >= 0.999
    assert [h["cos"] for h in hits] == sorted(
        (h["cos"] for h in hits), reverse=True
    )
    assert client.post("/vectors/_search", json={}).status_code == 400


def test_service_entrypoint_builds(spark, tmp_path, monkeypatch):
    """`python -m chillastic_spark` wiring: build() constructs the
    engine + app from the environment without binding a port, and the
    app serves the status route."""
    monkeypatch.setenv("CHILLASTIC_STATE_ROOT", str(tmp_path / "state"))
    monkeypatch.setenv("CHILLASTIC_API_KEY", "sekrit")
    from chillastic_spark.__main__ import build

    engine, app = build()
    c = app.test_client()
    assert c.get("/").status_code == 401  # api key enforced
    r = c.get("/", headers={"api_key": "sekrit"})
    assert r.status_code == 200
    assert "tasks" in r.get_json()


def test_drift_endpoint(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chillastic_spark.api import create_app
    from chillastic_spark.engine import Engine
    from chillastic_spark.streaming import drift_stream

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pdf = corpus.toPandas()
    stream_dir = tmp_path / "drift-in"
    stream_dir.mkdir()
    pq.write_table(
        pa.Table.from_pandas(pdf.iloc[:200], preserve_index=False),
        str(stream_dir / "part-0000.parquet"),
    )
    out_dir = str(tmp_path / "drift-out")
    q = drift_stream(
        spark, str(stream_dir), corpus, out_dir, str(tmp_path / "drift-ck")
    )
    q.awaitTermination(120)

    eng = Engine(spark, str(tmp_path / "st-drift"))
    app = create_app(eng)
    client = app.test_client()
    assert client.get("/drift").status_code == 400
    assert client.get("/drift?path=/nonexistent").status_code == 404
    resp = client.get(f"/drift?path={out_dir}")
    assert resp.status_code == 200
    body = resp.get_json()
    assert body["batch"] == 0 and len(body["sources"]) >= 1
    # worst drift first
    kls = [s["kl"] for s in body["sources"]]
    assert kls == sorted(kls, reverse=True)


def test_malformed_task_bodies_are_400s(client):
    """Client-shaped parse failures (bad mutator spec, null transfer
    sub-objects) must be 400 validation errors, not 500s."""
    c, _src, _dst = client
    r = c.post("/tasks/bad1", json={"mutators": [{}]})
    assert r.status_code == 400, r.data
    # the error must say WHAT was wrong (either the generic task-body
    # wrapper or the specific parse-time ActionRef message)
    err = r.get_json()["error"]
    assert "malformed" in err or "action ref" in err, err
    r = c.post("/tasks/bad2", json={"transfer": {"indices": None}})
    assert r.status_code == 400, r.data


def test_rest_task_carries_index_comparator(spark, tmp_path, store_factory):
    """The REST control plane must map transfer.index_comparator —
    silently dropping it builds backlogs in default order."""
    from chillastic_spark.api import task_from_json

    body = {
        "source": "/s", "destination": "/d",
        "transfer": {"from_indices": "*", "index_comparator": "CMPSRC"},
    }
    assert task_from_json(body).transfer.index_comparator == "CMPSRC"
    # the reference-shaped nested spelling works too
    body2 = {
        "source": "/s", "destination": "/d",
        "transfer": {"indices": {"comparator": "CMPSRC2"}},
    }
    assert task_from_json(body2).transfer.index_comparator == "CMPSRC2"


def test_action_ref_parse_validates_parts():
    """Malformed mutator specs 400 at ADMISSION (ValueError from parse),
    not mid-run as an unknown mutator."""
    import pytest as _pytest

    from chillastic_spark.model import ActionRef

    assert ActionRef.parse("ns1/m1").key() == ("ns1", "m1")
    for bad in ("ns/", "a/b/c", "1bad", ""):
        with _pytest.raises(ValueError):
            ActionRef.parse(bad)


def test_subtask_id_is_numerically_canonical():
    """Equal Subtasks must share ONE id — producers mix int and float
    bounds, and json renders -1 and -1.0 differently."""
    from chillastic_spark.model import Subtask

    a = Subtask(kind="doc", names="ix", min_size=-1, max_size=-1)
    b = Subtask(kind="doc", names="ix", min_size=-1.0, max_size=-1.0)
    assert a == b and a.subtask_id() == b.subtask_id()


def test_progress_rejects_bools():
    import pytest as _pytest

    from chillastic_spark.model import Progress

    with _pytest.raises(ValueError):
        Progress(tick=True, transferred=False, total=0).validate()
