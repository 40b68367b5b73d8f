"""Jar-free Elasticsearch REST adapter: the reference's scan-scroll →
bulk-upsert data plane over plain HTTP.

Two ES paths exist in this repo:

* ``sources/elasticsearch.py`` — the DISTRIBUTED path: es-hadoop
  connector options (jar-gated; every executor scrolls its own shard
  slice). Use on a cluster.
* this module — the CONTRACT path: a small driver-paged client that
  speaks the exact protocol the reference speaks (transfer.js:79-151:
  ``_search?scroll=30m&size=N`` → repeated ``_search/scroll`` until
  ``hits.total`` is drained; transfer.js:159-189: ``_bulk`` NDJSON of
  ``{"update": {...}}\\n{"doc": ..., "doc_as_upsert": true}``;
  transfer.js:306-352: retry with backoff on
  ``es_rejected_execution_exception``). Driver-paged is exactly how the
  reference itself moves data (one Node process per subtask); here it
  exists so the ES wire contract is EXECUTED end-to-end in tests, not
  merely option-mapped.
"""
from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession

from chillastic_spark.sources import ENVELOPE_SCHEMA
from chillastic_spark.sources.elasticsearch import SCROLL_TTL, _range_body

BULK_REJECTED = "es_rejected_execution_exception"


def _post(url: str, body: "dict | str | None", ndjson: bool = False) -> dict:
    data = None
    headers = {"Content-Type": "application/x-ndjson" if ndjson else "application/json"}
    if body is not None:
        data = (body if isinstance(body, str) else json.dumps(body)).encode()
    req = urllib.request.Request(url, data=data, headers=headers, method="POST")
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read().decode())


def scan(
    base_url: str,
    index: str,
    doc_type: Optional[str] = None,
    flush_size: int = 100,
    min_size: float = -1,
    max_size: float = -1,
) -> "Iterable[dict]":
    """Scan-and-scroll generator yielding raw hit dicts — the
    transfer.js:119-146 loop: page, then keep scrolling until
    ``hits.total`` documents have been seen."""
    path = f"{base_url}/{index}" + (f"/{doc_type}" if doc_type else "")
    body = None
    if min_size >= 0 and max_size >= 0:
        body = _range_body(min_size, max_size)  # subtask.js:61-74
    resp = _post(f"{path}/_search?scroll={SCROLL_TTL}&size={flush_size}", body)
    scrolled = 0
    while True:
        hits = resp["hits"]["hits"]
        for h in hits:
            scrolled += 1
            yield h
        if scrolled >= resp["hits"]["total"] or not hits:
            return
        resp = _post(  # transfer.js:79-83
            f"{base_url}/_search/scroll",
            {"scroll_id": resp["_scroll_id"], "scroll": "1h"},
        )


def scan_to_df(
    spark: SparkSession,
    base_url: str,
    index: str,
    doc_type: Optional[str] = None,
    flush_size: int = 100,
    min_size: float = -1,
    max_size: float = -1,
) -> DataFrame:
    """Scroll one (index[,type][,size-range]) slice into an envelope
    DataFrame (the store.read twin over the wire)."""
    rows = [
        (
            h["_index"],
            h.get("_type"),
            str(h["_id"]),
            json.dumps(h["_source"], sort_keys=True),
            h.get("_size"),
        )
        for h in scan(base_url, index, doc_type, flush_size, min_size, max_size)
    ]
    return spark.createDataFrame(rows, ENVELOPE_SCHEMA)


def doc_to_bulk(doc: dict) -> list[str]:
    """One document → its two NDJSON bulk lines, field-for-field the
    reference's docToBulk (transfer.js:175-189)."""
    return [
        json.dumps(
            {"update": {"_index": doc["_index"], "_type": doc["_type"], "_id": doc["_id"]}},
            separators=(",", ":"),
        ),
        json.dumps(
            {"doc": doc["_source"], "doc_as_upsert": True}, separators=(",", ":")
        ),
    ]


def bulk_upsert(
    df: DataFrame,
    base_url: str,
    flush_size: int = 100,
    max_retries: int = 5,
    backoff_sec: float = 0.01,
) -> int:
    """Deliver an envelope DataFrame as ``_bulk`` doc_as_upsert batches.

    Batches of ``flush_size`` docs (transfer.js:159-167 flush
    threshold); a batch whose response carries
    ``es_rejected_execution_exception`` items is retried whole with
    backoff (transfer.js:306-352) — safe because doc_as_upsert is
    idempotent. Returns docs delivered."""
    delivered = 0
    batch: list[str] = []
    pending = 0

    def flush() -> None:
        nonlocal delivered, batch, pending
        if not batch:
            return
        payload = "\n".join(batch) + "\n"
        for attempt in range(max_retries + 1):
            resp = _post(f"{base_url}/_bulk", payload, ndjson=True)
            rejected = resp.get("errors") and any(
                BULK_REJECTED in json.dumps(item) for item in resp.get("items", [])
            )
            if not rejected:
                delivered += pending
                batch, pending = [], 0
                return
            if attempt == max_retries:
                raise RuntimeError(f"bulk rejected after {max_retries} retries")
            time.sleep(backoff_sec * (2**attempt))

    for row in df.toLocalIterator():
        doc = {
            "_index": row["_index"],
            "_type": row["_type"],
            "_id": row["_id"],
            "_source": json.loads(row["_source"]),
        }
        batch.extend(doc_to_bulk(doc))
        pending += 1
        if pending >= flush_size:
            flush()
    flush()
    return delivered
