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
