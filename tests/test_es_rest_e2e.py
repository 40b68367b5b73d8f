"""Executed end-to-end contract test of the reference's ES data plane:
scan-and-scroll → mutate → bulk doc_as_upsert over real HTTP
(transfer.js:79-189), against the in-process wire fixture."""
import json

import pytest

from pyspark.sql import functions as F

from chillastic_spark.operators.mutate import apply_data_mutators
from chillastic_spark.registry import Mutators
from chillastic_spark.sources import es_rest
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
def es_pair():
    src, dst = FakeES(), FakeES()
    src_url, dst_url = src.start(), dst.start()
    yield src, src_url, dst, dst_url
    src.stop()
    dst.stop()


def _seed(src, n=25, index="log_2016-12-01", typ="t1"):
    src.seed(index, typ, {
        f"id{i}": {"field": f"value {i}", "__size": 10 * i} for i in range(n)
    })


def test_scan_scroll_pages_through_everything(spark, es_pair):
    src, src_url, _dst, _ = es_pair
    _seed(src, n=25)
    # flush_size 7 → 1 search page + 3 scroll pages (transfer.js loop)
    df = es_rest.scan_to_df(
        spark, src_url, "log_2016-12-01", "t1", flush_size=7, slices=1
    )
    assert df.count() == 25
    assert set(df.columns) == {"_index", "_type", "_id", "_source", "_size"}
    assert len(src.scrolls) == 1  # one scroll context served every page
    # context freed on drain, not left to the 1h TTL
    assert src.cleared_scrolls == list(src.scrolls)


def test_sliced_scan_runs_in_executor_tasks(spark, es_pair):
    """The r3 #1 item, proven on the wire: a multi-slice scan is N
    Spark tasks each draining their OWN sliced scroll (worker.js:61-123
    as executor tasks) — the driver never materializes the slice."""
    src, src_url, _dst, _ = es_pair
    _seed(src, n=40)
    df = es_rest.scan_to_df(
        spark, src_url, "log_2016-12-01", "t1", flush_size=5, slices=4
    )
    rows = df.collect()
    assert len(rows) == 40
    assert sorted(r["_id"] for r in rows) == sorted(f"id{i}" for i in range(40))
    # four scroll contexts, one per disjoint slice
    slices = [st["slice"] for st in src.scrolls.values()]
    assert sorted((s["id"], s["max"]) for s in slices) == [
        (i, 4) for i in range(4)
    ]
    # each search was issued from a distinct Spark task (worker header
    # recorded per request by the fixture)
    assert src.workers_seen("search") == {"0", "1", "2", "3"}
    # every context cleared after its task drained it
    assert sorted(src.cleared_scrolls) == sorted(src.scrolls)


def test_size_range_pushed_into_search_body(spark, es_pair):
    src, src_url, _dst, _ = es_pair
    _seed(src, n=25)
    df = es_rest.scan_to_df(
        spark, src_url, "log_2016-12-01", "t1", flush_size=100,
        min_size=50, max_size=100,
    )
    # __size = 10i, 50 <= 10i < 100 → i in 5..9
    assert sorted(r["_id"] for r in df.collect()) == [f"id{i}" for i in range(5, 10)]


def test_full_transfer_scan_mutate_bulk(spark, es_pair):
    """The reference's whole data plane in one pass: scroll out of the
    source cluster, run the registered date-reroute mutator, bulk
    doc_as_upsert into the destination cluster (worker golden,
    transfer.spec.js:487-511 reshaped over the wire)."""
    src, src_url, dst, dst_url = es_pair
    _seed(src, n=20)
    m = Mutators()
    m.add("indexDate", DATE_MUTATOR)
    df = es_rest.scan_to_df(spark, src_url, "log_2016-12-01", "t1", flush_size=6)
    mutated = apply_data_mutators(df, m.load([__import__(
        "chillastic_spark.model", fromlist=["m"]).ActionRef(id="indexDate")]))
    assert es_rest.bulk_upsert(mutated, dst_url, flush_size=6) == 20
    got = dst.contents("log_2016-12")  # rerouted to the month index
    assert len(got) == 20
    assert got["id7"]["field"] == "value 7"
    # re-delivery is a no-op on content (doc_as_upsert idempotence)
    es_rest.bulk_upsert(mutated, dst_url, flush_size=6)
    assert dst.contents("log_2016-12") == got


def test_bulk_ndjson_bytes_match_reference_docToBulk(spark, es_pair):
    _src, _, dst, dst_url = es_pair
    df = spark.createDataFrame(
        [("ix", "t", "a", json.dumps({"k": 1}), None)],
        "_index string, _type string, _id string, _source string, _size long",
    )
    es_rest.bulk_upsert(df, dst_url)
    body = dst.bulk_bodies[-1]
    assert body == (
        '{"update":{"_index":"ix","_type":"t","_id":"a"}}\n'
        '{"doc":{"k":1},"doc_as_upsert":true}\n'
    )


def test_bulk_retries_on_rejected_execution(spark):
    dst = FakeES(reject_first_bulks=2)
    url = dst.start()
    try:
        df = spark.range(5).select(
            F.lit("ix").alias("_index"), F.lit("t").alias("_type"),
            F.col("id").cast("string").alias("_id"),
            F.to_json(F.struct("id")).alias("_source"),
            F.lit(None).cast("long").alias("_size"),
        )
        assert es_rest.bulk_upsert(df, url, max_retries=5) == 5
        assert len(dst.contents("ix")) == 5
        assert len(dst.bulk_bodies) == 3  # 2 rejections + 1 success
    finally:
        dst.stop()


def test_partial_doc_merge_semantics(spark, es_pair):
    """doc_as_upsert merges partial docs into existing ones — the update
    API behavior the reference relies on for re-delivery."""
    _src, _, dst, dst_url = es_pair
    dst.seed("ix", "t", {"a": {"old": 1, "keep": True}})
    df = spark.createDataFrame(
        [("ix", "t", "a", json.dumps({"old": 2, "new": 3}), None)],
        "_index string, _type string, _id string, _source string, _size long",
    )
    es_rest.bulk_upsert(df, dst_url)
    assert dst.contents("ix")["a"] == {"old": 2, "keep": True, "new": 3}


def test_es_purge_deletes_victims_idempotently(spark, es_pair):
    from chillastic_spark.sources.es_rest import ESStore

    src, src_url, _dst, _ = es_pair
    _seed(src, n=10)
    store = ESStore(src_url)
    assert store.purge(spark, "log_2016-12-01", ["id3", "id7", "ghost"]) == 2
    assert len(src.contents("log_2016-12-01")) == 8
    assert store.purge(spark, "log_2016-12-01", ["id3", "id7"]) == 0  # no-op


def test_send_bulk_mixed_failure_raises_immediately_without_retry_burn():
    """A permanent mapper failure mixed with 429 rejections must raise
    on the FIRST attempt naming the mapper error — not burn every
    retry and be misreported as 'bulk rejected'."""
    calls = []

    class W:
        def post(self, path, payload, ndjson=False):
            calls.append(payload)
            return {"errors": True, "items": [
                {"update": {"status": 429, "error": {
                    "type": "es_rejected_execution_exception"}}},
                {"update": {"status": 400, "error": {
                    "type": "mapper_parsing_exception", "reason": "boom"}}},
            ]}

    lines = []
    for i in range(2):
        lines += [json.dumps({"update": {"_index": "ix", "_id": str(i)}}),
                  json.dumps({"doc": {"v": i}, "doc_as_upsert": True})]
    with pytest.raises(RuntimeError, match="mapper_parsing_exception"):
        es_rest._send_bulk(W(), lines, 2, max_retries=5)
    assert len(calls) == 1


def test_send_bulk_resends_only_rejected_items():
    """Per-item retry accounting: delivered docs are not re-upserted
    alongside the rejected one."""
    calls = []

    class W:
        def post(self, path, payload, ndjson=False):
            calls.append(payload)
            if len(calls) == 1:
                return {"errors": True, "items": [
                    {"update": {"status": 200}},
                    {"update": {"status": 429, "error": {
                        "type": "es_rejected_execution_exception"}}},
                    {"update": {"status": 200}},
                ]}
            return {"errors": False, "items": [{"update": {"status": 200}}]}

    lines = []
    for i in range(3):
        lines += [json.dumps({"update": {"_index": "ix", "_id": f"d{i}"}}),
                  json.dumps({"doc": {"v": i}, "doc_as_upsert": True})]
    assert es_rest._send_bulk(W(), lines, 3, max_retries=5) == 3
    assert len(calls) == 2
    assert '"d1"' in calls[1] and '"d0"' not in calls[1] and '"d2"' not in calls[1]


def test_item_rejected_inspects_error_field_only():
    """An _id containing the exception name must not classify a mapper
    failure as retryable backpressure."""
    assert es_rest._item_rejected(
        {"type": "es_rejected_execution_exception"})
    assert es_rest._item_rejected(
        {"type": "x", "caused_by": {"type": "es_rejected_execution_exception"}})
    assert es_rest._item_rejected("rejected: es_rejected_execution_exception")
    assert not es_rest._item_rejected(
        {"type": "mapper_parsing_exception",
         "reason": "field es_rejected_execution_exception bad"})
    assert not es_rest._item_rejected(None)


def test_read_sizes_is_metadata_only(spark):
    """Planning reads sizes via a `_source: false` scroll at 10k pages
    — the size-stats sample must not drag document bodies over the
    wire (the fixture honors the filter, so this also proves the scan
    works without _source present)."""
    src = FakeES()
    url = src.start()
    try:
        for i in range(7):
            src.seed("ix", "t", {f"d{i}": {"pad": "x" * 50, "__size": 10 + i}})
        store = es_rest.ESStore(url, slices=1)
        sizes = sorted(
            r["_size"] for r in store.read_sizes(spark, "ix", "t").collect()
        )
        assert sizes == [10 + i for i in range(7)]
        searches = [
            r for r in src.request_log
            if r["kind"] == "search" and "scroll=" in r["path"]
        ]
        assert searches, src.request_log
        assert '"_source": false' in searches[-1]["body"]
        assert "size=10000" in searches[-1]["path"]
    finally:
        src.stop()


def test_count_falls_back_to_track_total_hits_when_probe_fails(spark):
    """A transiently failing version probe against an ES>=7 cluster
    must not plan with the 10k-capped total: count re-asks with
    track_total_hits instead of returning the cap."""
    src = FakeES(version="7.10.0", total_cap=2)  # cap BINDS: 3 docs
    url = src.start()
    try:
        src.seed("ix", "t", {f"d{i}": {"v": i} for i in range(3)})
        store = es_rest.ESStore(url, slices=1)
        # simulate the probe failing: major_version() sees 0
        store.wire._version = None
        orig = es_rest.Wire.version
        try:
            es_rest.Wire.version = lambda self: ()
            assert store.count(spark, "ix", "t") == 3
        finally:
            es_rest.Wire.version = orig
    finally:
        src.stop()
