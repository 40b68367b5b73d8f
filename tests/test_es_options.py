"""Option-mapping tests for the optional ES connector (jar not in the
container; read/write must fail clearly, option-building is pure)."""
import json

import pytest

from chillastic_spark.sources import elasticsearch as es


def test_options_reproduce_reference_tuning():
    opts = es.es_options(
        host="es.example.com",
        port=9201,
        index="myindex1",
        doc_type="mytype1",
        flush_size=2500,
        min_size=0,
        max_size=6145,
        https=True,
        auth_token="Basic abc",
        path_prefix="/es",
    )
    assert opts["es.resource"] == "myindex1/mytype1"
    assert opts["es.scroll.size"] == "2500"
    assert opts["es.scroll.keepalive"] == "30m"
    assert opts["es.write.operation"] == "upsert"
    assert opts["es.mapping.id"] == "_id"
    assert opts["es.batch.size.bytes"] == "50mb"
    assert opts["es.batch.write.retry.count"] == "5"
    assert opts["es.http.timeout"] == "240s"
    assert opts["es.net.ssl"] == "true"
    assert opts["es.net.http.header.Authorization"] == "Basic abc"
    assert opts["es.nodes.path.prefix"] == "/es"
    q = json.loads(opts["es.query"])
    assert q["query"]["range"]["_size"] == {"gte": 0, "lt": 6145}


def test_no_range_query_without_bounds():
    opts = es.es_options(host="h", index="i")
    assert "es.query" not in opts
    assert opts["es.resource"] == "i"


def test_read_fails_clearly_without_jar(spark):
    with pytest.raises(RuntimeError, match="elasticsearch-hadoop"):
        es.read(spark, host="localhost", index="i")


# --------------------------------------------------- golden DSL contract
# Recorded request/DSL shapes of Subtask.createQuery (subtask.js:50-77):
# what the reference actually hands its ES client for (a) a sized scroll
# scan with a _size range, (b) a count query (flushSize=0 → no scroll),
# (c) an unbounded scan (falsy maxSize plans as -1 → no body). The JSON
# goldens are JSON.stringify-compact, byte-for-byte.

GOLDEN_SCAN = (
    '{"index":"myindex1","type":"mytype1","size":2500,"scroll":"30m",'
    '"body":{"query":{"range":{"_size":{"gte":0,"lt":6145}}}}}'
)
GOLDEN_COUNT = '{"index":"myindex1","type":"mytype1","size":0,"body":{"query":{"range":{"_size":{"gte":10,"lt":100}}}}}'
GOLDEN_UNBOUNDED = '{"index":"myindex1","type":"mytype1","size":100,"scroll":"30m"}'


def _stringify(d):  # JSON.stringify drops undefined (None) members
    def clean(o):
        if isinstance(o, dict):
            return {k: clean(v) for k, v in o.items() if v is not None}
        return o

    return json.dumps(clean(d), separators=(",", ":"))


def test_scan_request_matches_reference_golden():
    req = es.scan_request(
        "myindex1", "mytype1", flush_size=2500, min_size=0, max_size=6145
    )
    assert _stringify(req) == GOLDEN_SCAN


def test_count_request_matches_reference_golden():
    # subtasks.js:98 counts with flushSize=0 → no scroll key
    req = es.scan_request("myindex1", "mytype1", flush_size=0, min_size=10, max_size=100)
    assert _stringify(req) == GOLDEN_COUNT


def test_unbounded_request_has_no_body():
    # JS `maxSize || -1`: absent/0 maxSize disables the range body
    req = es.scan_request("myindex1", "mytype1")
    assert _stringify(req) == GOLDEN_UNBOUNDED
    assert _stringify(es.scan_request("myindex1", "mytype1", max_size=0)) == GOLDEN_UNBOUNDED


def test_es_query_option_is_byte_identical_to_reference_body():
    """The DSL pushed through es.query must be the exact bytes of the
    reference's request body — same key order, same compact form."""
    opts = es.es_options(host="h", index="i", min_size=0, max_size=6145)
    body = es.scan_request("i", None, 100, 0, 6145)["body"]
    assert opts["es.query"] == _stringify(body)
    assert opts["es.query"] == '{"query":{"range":{"_size":{"gte":0,"lt":6145}}}}'
