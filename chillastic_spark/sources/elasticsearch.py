"""Optional real-Elasticsearch source/sink via elasticsearch-hadoop.

The parquet DocumentStore is this repo's testable storage; against a
real ES cluster the same pipelines run through the es-hadoop Spark
connector (`org.elasticsearch.spark.sql`), which implements the
reference's behaviors natively. This module maps every
performance-relevant constant from the reference's client/transfer
config (BASELINE.md) onto the connector's options, so a deployment
gets the same semantics:

    scroll scan + TTL       (transfer.js:103-151, subtask.js:58)  → es.scroll.*
    bulk upsert             (transfer.js:175-189)                 → es.write.operation=upsert
    rejected-exec backoff   (transfer.js:306-352)                 → es.batch.write.retry.*
    timeouts / compression  (config/elasticsearch.js:116-136)     → es.http.*
    _size range pushdown    (subtask.js:61-74)                    → es.query range DSL

The es-hadoop jar is not in this container, so ``read``/``write``
raise a clear error unless the format is available; option-building is
pure and unit-tested.
"""
from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

ES_FORMAT = "org.elasticsearch.spark.sql"

SCROLL_TTL = "30m"  # subtask.js:58


def _range_body(min_size, max_size) -> dict:
    """The scroll-scan range body, field-for-field (subtask.js:61-73).
    ``None`` bounds are omitted exactly like JSON.stringify drops
    undefined members."""
    rng = {}
    if min_size is not None:
        rng["gte"] = min_size
    if max_size is not None:
        rng["lt"] = max_size
    return {"query": {"range": {"_size": rng}}}


def scan_request(
    index: str,
    doc_type: Optional[str] = None,
    flush_size: int = 100,
    min_size: Optional[float] = None,
    max_size: Optional[float] = None,
) -> dict:
    """The reference's generated scroll query verbatim
    (Subtask.createQuery, subtask.js:50-77) — including the JS ``||``
    defaulting quirks: a falsy minSize plans as 0, a falsy maxSize as
    -1 (which disables the range body). Used by the golden contract
    test to prove the DSL this module pushes at ES is byte-identical
    to what the reference sends."""
    request: dict = {"index": index, "type": doc_type, "size": flush_size}
    if flush_size > 0:
        request["scroll"] = SCROLL_TTL
    final_min = min_size or 0
    final_max = max_size or -1
    if final_min >= 0 and final_max >= 0:
        request["body"] = _range_body(min_size, max_size)
    return request


def es_options(
    host: str,
    port: int = 9200,
    index: str = "*",
    doc_type: Optional[str] = None,
    flush_size: int = 100,          # Subtask.DEFAULT_FLUSH_SIZE
    scroll_keepalive: str = "30m",  # initial scroll TTL (subtask.js:58)
    min_size: float = -1,
    max_size: float = -1,
    https: bool = False,
    auth_token: Optional[str] = None,
    path_prefix: Optional[str] = None,
) -> dict[str, str]:
    """Connector options reproducing the reference's transfer tuning."""
    resource = index if doc_type is None else f"{index}/{doc_type}"
    opts = {
        "es.nodes": host,
        "es.port": str(port),
        "es.resource": resource,
        # scan side
        "es.scroll.size": str(flush_size),
        "es.scroll.keepalive": scroll_keepalive,
        # sink side: idempotent doc_as_upsert on _id
        "es.write.operation": "upsert",
        "es.mapping.id": "_id",
        "es.batch.size.entries": str(flush_size),
        "es.batch.size.bytes": "50mb",  # target bulk payload (subtasks.js:267)
        # rejected-execution backpressure (transfer.js:9-11,306-352)
        "es.batch.write.retry.count": "5",
        "es.batch.write.retry.wait": "2s",
        # client economy (config/elasticsearch.js:116,132-136)
        "es.http.timeout": "240s",
        "es.http.retries": "3",
        "es.net.ssl": str(https).lower(),
    }
    if auth_token:
        opts["es.net.http.header.Authorization"] = auth_token
    if path_prefix:
        opts["es.nodes.path.prefix"] = path_prefix
    # Same falsy-defaulting quirk as scan_request (subtask.js:59-60):
    # a falsy maxSize (0/None) means "no upper bound" and DISABLES the
    # range body entirely — pushing {"lt": 0} instead would silently
    # scan zero documents for a config the reference treats as
    # unbounded.
    final_min = min_size or 0
    final_max = max_size or -1
    if final_min >= 0 and final_max >= 0:
        # subtask range predicate pushed into the ES query DSL — the
        # SAME body scan_request builds, serialized compactly the way
        # JSON.stringify does, so the wire bytes match the reference's
        opts["es.query"] = json.dumps(
            _range_body(min_size, max_size), separators=(",", ":")
        )
    return opts


def _format_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.elasticsearch.spark.sql.DefaultSource"
        )
        return True
    except Exception:
        return False


def read(spark: SparkSession, **kwargs) -> DataFrame:
    if not _format_available(spark):
        raise RuntimeError(
            "elasticsearch-hadoop jar not on the classpath; add "
            "org.elasticsearch:elasticsearch-spark-30_2.13 to spark.jars.packages"
        )
    return spark.read.format(ES_FORMAT).options(**es_options(**kwargs)).load()


def write(df: DataFrame, **kwargs) -> None:
    spark = df.sparkSession
    if not _format_available(spark):
        raise RuntimeError(
            "elasticsearch-hadoop jar not on the classpath; add "
            "org.elasticsearch:elasticsearch-spark-30_2.13 to spark.jars.packages"
        )
    df.write.format(ES_FORMAT).options(**es_options(**kwargs)).mode("append").save()
