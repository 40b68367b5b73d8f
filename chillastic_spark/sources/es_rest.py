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

import fnmatch

from pyspark.sql import DataFrame, SparkSession

from chillastic_spark.sources import (
    ENVELOPE_SCHEMA,
    StoreError,
    clean_index_settings,
    types_of_config,
)
from chillastic_spark.sources.elasticsearch import SCROLL_TTL, _range_body

BULK_REJECTED = "es_rejected_execution_exception"


def _get(url: str) -> dict:
    with urllib.request.urlopen(url) as resp:
        return json.loads(resp.read().decode())


def _put(url: str, body: dict) -> dict:
    req = urllib.request.Request(
        url,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="PUT",
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read().decode())


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
    body: "Optional[dict]" = None,
) -> "Iterable[dict]":
    """Scan-and-scroll generator yielding raw hit dicts — the
    transfer.js:119-146 loop: page, then keep scrolling until
    ``hits.total`` documents have been seen. ``body`` overrides the
    query (e.g. an ids query for purge); the default is the subtask
    ``_size``-range body when bounds are given."""
    path = f"{base_url}/{index}" + (f"/{doc_type}" if doc_type else "")
    if body is None and min_size >= 0 and max_size >= 0:
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
        # continuation keep-alive is '1h' exactly like the reference
        # (transfer.js:79-83 scroll: '1h'); like the reference, contexts
        # expire by TTL — no explicit DELETE _search/scroll
        resp = _post(
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
    meta = {"_index": doc["_index"], "_type": doc["_type"], "_id": doc["_id"]}
    if meta["_type"] is None:
        del meta["_type"]  # JSON.stringify drops undefined; ES rejects null
    return [
        json.dumps({"update": meta}, separators=(",", ":")),
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
            if not resp.get("errors"):
                delivered += pending
                batch, pending = [], 0
                return
            items = resp.get("items", [])
            rejected = any(BULK_REJECTED in json.dumps(i) for i in items)
            if not rejected:
                # mapper/validation failures are NOT retryable and must
                # not be silently counted as delivered — the subtask
                # errors and reappears on backlog rebuild
                bad = [i for i in items if "error" in json.dumps(i)][:3]
                raise RuntimeError(f"bulk item failures: {bad}")
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


class ESStore:
    """The DocumentStore surface spoken over the ES wire protocol, so a
    Task's source/destination can be an http(s) URL and the SAME Engine
    pipeline (admission → backlog planning → scan → mutate → deliver)
    runs against an Elasticsearch cluster — what the reference does
    natively (its source/destination are ES host configs,
    models/task.js).

    Catalog ops map to the index/template APIs the reference's client
    calls (transfer.js:364-372 indices.get, :224-258 indices.create,
    :383-406 getTemplate/putTemplate); data ops ride scan_to_df /
    bulk_upsert above. Planning reads (count, size-stats sample) are
    ``size=0`` searches and scrolls, exactly the reference's
    subtasks.js:97-100 count query.
    """

    def __init__(self, base_url: str):
        self.root = base_url.rstrip("/")

    def reachable(self) -> bool:
        try:
            _get(self.root + "/")
            return True
        except Exception:  # noqa: BLE001
            return False

    # ---------------------------------------------------- index configs
    def get_indices(self, pattern: str) -> list[dict]:
        if not isinstance(pattern, str) or not pattern:
            raise StoreError("pattern must be a non-empty string")
        try:
            resp = _get(f"{self.root}/{pattern}")
        except urllib.error.HTTPError as e:
            if e.code == 404:  # no matching index — plan zero subtasks,
                return []      # same as the DocumentStore twin
            raise
        return [dict(cfg, name=name) for name, cfg in sorted(resp.items())]

    def put_indices(self, indices: list[dict]) -> None:
        if not isinstance(indices, list):
            raise StoreError("indices must be a list")
        for index in indices:
            index = json.loads(json.dumps(index))
            name = index.pop("name", None)
            if not isinstance(name, str):
                raise StoreError("index config must carry a string name")
            clean_index_settings(index)  # transfer.js:234-243
            _put(f"{self.root}/{name}", index)

    # ------------------------------------------------------- templates
    def get_templates(self, pattern: str) -> list[dict]:
        if not isinstance(pattern, str) or not pattern:
            raise StoreError("pattern must be a non-empty string")
        try:
            resp = _get(f"{self.root}/_template/{pattern}")
        except urllib.error.HTTPError as e:
            if e.code == 404:  # transfer.js:397-401
                raise StoreError("Templates asked to be copied, but none found") from e
            raise
        found = [
            dict(cfg, name=name)
            for name, cfg in sorted(resp.items())
            if not any(p.startswith(".") for p in cfg.get("index_patterns", []))
        ]
        if not found:
            raise StoreError("Templates asked to be copied, but none found")
        return found

    def put_templates(self, templates: list[dict]) -> None:
        if not isinstance(templates, list):
            raise StoreError("templates must be a list")
        for template in templates:
            template = json.loads(json.dumps(template))
            name = template.pop("name", None)
            if not isinstance(name, str):
                raise StoreError("template must carry a string name")
            _put(f"{self.root}/_template/{name}", template)

    # ------------------------------------------------------------ types
    def types_of(self, index_cfg: dict) -> list[dict]:
        return types_of_config(index_cfg)

    # ------------------------------------------------------------- data
    def list_data_indices(self, pattern: str = "*") -> list[str]:
        return sorted(
            fnmatch.filter((c["name"] for c in self.get_indices("*")), pattern)
        )

    def read(
        self,
        spark: SparkSession,
        index: str,
        type: Optional[str] = None,
        min_size: float = -1,
        max_size: float = -1,
        flush_size: int = 100,
    ) -> DataFrame:
        return scan_to_df(
            spark, self.root, index, type, flush_size=flush_size,
            min_size=min_size, max_size=max_size,
        )

    def count(
        self,
        spark: SparkSession,
        index: str,
        type: Optional[str] = None,
        min_size: float = -1,
        max_size: float = -1,
    ) -> int:
        """size=0 count search (subtasks.js:97-100)."""
        path = f"{self.root}/{index}" + (f"/{type}" if type else "")
        body = _range_body(min_size, max_size) if (min_size >= 0 and max_size >= 0) else None
        return _post(f"{path}/_search?size=0", body)["hits"]["total"]

    def deliver(self, spark: SparkSession, df: DataFrame, flush_size: int = 100) -> int:
        """Sink dispatch target for Transfer: bulk doc_as_upsert at the
        planned flushSize (transfer.js:159-167)."""
        return bulk_upsert(df, self.root, flush_size=flush_size)

    def index_path(self, index: str) -> str:  # lock key for Transfer
        return f"{self.root}/{index}"

    def purge(
        self,
        spark: SparkSession,
        index: str,
        ids: "DataFrame | list[str]",
        type: Optional[str] = None,
    ) -> int:
        """sinks.purge twin over the wire: resolve victim (type, id)
        keys with a scroll (types aren't client-known), then _bulk
        delete actions."""
        if isinstance(ids, list):
            victims = {str(i) for i in ids}
        else:
            victims = {
                str(r["_id"]) for r in ids.select("_id").distinct().collect()
            }
        if not victims:
            return 0
        # ids query: only the victims travel, not the index
        body = {"query": {"ids": {"values": sorted(victims)}}}
        keys = [
            (h.get("_type"), str(h["_id"]))
            for h in scan(self.root, index, type, body=body)
            if str(h["_id"]) in victims
        ]
        return bulk_delete(self.root, index, keys)


def bulk_delete(
    base_url: str,
    index: str,
    keys: "list[tuple[str, str]]",
    flush_size: int = 100,
) -> int:
    """Targeted per-id delete via ``_bulk`` ``delete`` actions — the ES
    twin of sinks.purge (right-to-be-forgotten). ``keys`` are
    (doc_type, _id) pairs. Returns docs actually deleted (idempotent:
    re-running yields not_found, counted 0)."""
    deleted = 0
    for start in range(0, len(keys), flush_size):
        lines = [
            json.dumps(
                {"delete": {"_index": index, "_type": t, "_id": i}},
                separators=(",", ":"),
            )
            for t, i in keys[start : start + flush_size]
        ]
        resp = _post(f"{base_url}/_bulk", "\n".join(lines) + "\n", ndjson=True)
        for item in resp.get("items", []):
            if item.get("delete", {}).get("result") == "deleted":
                deleted += 1
    return deleted
