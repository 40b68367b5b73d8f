"""In-process Elasticsearch wire fixture for the contract e2e tests.

Speaks the minimal subset of the ES HTTP API the reference engine uses
(transfer.js:79-151, 159-189): ``_search?scroll&size`` with an optional
``_size``-range body, sliced scrolls (the ``slice`` search parameter,
ES >= 5.0 — documents partition by crc32(_id) % max), ``_search/scroll``
continuation and DELETE (context clearing), and ``_bulk``
doc_as_upsert / delete NDJSON. Backed by a dict; records every bulk
payload AND a chronological ``request_log`` (method, path,
Authorization, worker header, slice) so tests can assert the exact wire
traffic — which task scanned what, whether bulks interleave with
scrolls, whether auth reached every request type.

Knobs:
- ``reject_first_bulks=N``: first N bulk calls answer with
  ``es_rejected_execution_exception`` items (retry/backoff contract).
- ``version="7.10.0"``: report that version from ``GET /`` and return
  ``hits.total`` as the ES 7 object form; ``total_cap`` caps the
  reported total with relation ``gte`` (the 10k default cap) to prove
  scans never trust an inexact total.
- ``auth_token="..."``: every request must carry exactly this
  Authorization header or get a 401.
- ``path_prefix="/es"``: the whole API mounts under the prefix; bare
  paths 404 (path-prefix config parity).
- ``fail_delete_ids={...}``: bulk delete actions for these ids answer
  with a 400 mapper item error (under-delete detection contract).
"""
from __future__ import annotations

import json
import threading
import uuid
import zlib
from typing import Optional

from flask import Flask, request
from werkzeug.exceptions import NotFound
from werkzeug.middleware.dispatcher import DispatcherMiddleware
from werkzeug.serving import make_server


class FakeES:
    def __init__(
        self,
        reject_first_bulks: int = 0,
        reject_first_bulks_http: int = 0,
        version: str = "5.6.0",
        total_cap: Optional[int] = None,
        auth_token: Optional[str] = None,
        path_prefix: str = "",
        fail_delete_ids: Optional[set] = None,
        reject_once_ids: Optional[set] = None,
        fail_first_searches: int = 0,
    ):
        # {(index, type, id): source}
        self.docs: dict[tuple, dict] = {}
        self.index_cfgs: dict[str, dict] = {}
        self.templates: dict[str, dict] = {}
        self.bulk_bodies: list[str] = []
        self.scrolls: dict[str, dict] = {}
        self.cleared_scrolls: list[str] = []
        self.request_log: list[dict] = []
        self.reject_remaining = reject_first_bulks
        # whole-request backpressure: real ES under write pressure 429s
        # the ENTIRE _bulk request at the HTTP layer (no items array)
        self.reject_http_remaining = reject_first_bulks_http
        self.version = version
        self.major = int(version.split(".")[0])
        self.total_cap = total_cap
        self.auth_token = auth_token
        self.path_prefix = path_prefix.rstrip("/")
        self.fail_delete_ids = fail_delete_ids or set()
        # per-ITEM backpressure: these ids get one 429-rejected item
        # (while the rest of the batch succeeds), then behave normally —
        # the real-ES partial-rejection shape
        self.reject_once_ids = set(reject_once_ids or set())
        # first N initial `_search` requests answer HTTP 500 — the
        # injected-search-failure mode for Spark task-retry tests
        # (SURVEY S2: retrying search)
        self.fail_first_searches = fail_first_searches
        self.app = self._build()
        self._server = None
        self._thread = None
        self._lock = threading.Lock()

    # ------------------------------------------------------------ data
    def seed(self, index: str, doc_type: str, docs: dict[str, dict]) -> None:
        for _id, src in docs.items():
            self.docs[(index, doc_type, str(_id))] = dict(src)
        self.index_cfgs.setdefault(
            index,
            {"settings": {"index": {"number_of_shards": 1}},
             "mappings": {doc_type: {}}, "aliases": {}},
        ).setdefault("mappings", {}).setdefault(doc_type, {})

    def seed_index_cfg(self, index: str, cfg: dict) -> None:
        self.index_cfgs[index] = cfg

    def seed_template(self, name: str, template: dict) -> None:
        self.templates[name] = template

    def contents(self, index: str) -> dict[str, dict]:
        with self._lock:  # snapshot: the server thread mutates docs
            items = list(self.docs.items())
        return {_id: src for (ix, _t, _id), src in items if ix == index}

    # ------------------------------------------------- log conveniences
    def requests_of(self, kind: str) -> list[dict]:
        """request_log rows by kind: search | scroll | clear_scroll |
        bulk | catalog | template | root."""
        return [r for r in self.request_log if r["kind"] == kind]

    def workers_seen(self, kind: Optional[str] = None) -> set:
        rows = self.request_log if kind is None else self.requests_of(kind)
        return {r["worker"] for r in rows if r["worker"]}

    def _total(self, n: int, body: "dict | None" = None) -> "int | dict":
        # real-ES semantics: track_total_hits=true always yields the
        # exact count; without it totals cap at total_cap (10k on a
        # real >= 7 cluster)
        if self.major < 7:
            # pre-7 totals are bare EXACT ints — the object/capped form
            # is a >= 7 wire shape a 5.x/6.x cluster can never produce
            return n
        if (body or {}).get("track_total_hits") is True:
            return {"value": n, "relation": "eq"}
        if self.total_cap is not None and n > self.total_cap:
            return {"value": self.total_cap, "relation": "gte"}
        return {"value": n, "relation": "eq"}

    # ------------------------------------------------------------- app
    def _build(self) -> Flask:
        import fnmatch

        app = Flask("fake-es")

        def classify(path: str, method: str) -> str:
            if path == "/":
                return "root"
            if path.endswith("/_bulk"):
                return "bulk"
            if path == "/_search/scroll":
                return "clear_scroll" if method == "DELETE" else "scroll"
            if path.endswith("/_search"):
                return "search"
            if "/_template/" in path:
                return "template"
            return "catalog"

        @app.before_request
        def log_and_auth():
            with self._lock:
                self.request_log.append({
                    "method": request.method,
                    "path": request.full_path.rstrip("?"),
                    "kind": classify(request.path, request.method),
                    "auth": request.headers.get("Authorization"),
                    "worker": request.headers.get("X-Chillastic-Worker"),
                    "content_type": request.headers.get("Content-Type"),
                    "body": request.get_data(as_text=True),
                })
            if self.auth_token is not None:
                if request.headers.get("Authorization") != self.auth_token:
                    return {"error": "missing authentication credentials"}, 401
            return None

        @app.get("/")
        def root():  # cluster-info ping + version probe
            return {"cluster_name": "fake-es", "version": {"number": self.version}}

        @app.get("/_template/<pattern>")
        def get_template(pattern):
            found = {
                n: t for n, t in self.templates.items() if fnmatch.fnmatch(n, pattern)
            }
            if not found:
                return {"error": "not found"}, 404
            return found

        @app.put("/_template/<name>")
        def put_template(name):
            self.templates[name] = request.get_json()
            return {"acknowledged": True}

        @app.get("/<pattern>")
        def get_indices(pattern):  # indices.get with glob (transfer.js:364-372)
            return {
                n: cfg
                for n, cfg in self.index_cfgs.items()
                if fnmatch.fnmatch(n, pattern)
            }

        @app.put("/<index>")
        def create_index(index):  # indices.create (transfer.js:251-256)
            self.index_cfgs[index] = request.get_json() or {}
            return {"acknowledged": True}

        def matches(_id: str, src_size: Optional[int], body: Optional[dict]) -> bool:
            q = (body or {}).get("query")
            if not q:
                return True
            if "ids" in q:
                return _id in q["ids"]["values"]
            rng = q["range"]["_size"]
            size = src_size if src_size is not None else 0
            if "gte" in rng and not size >= rng["gte"]:
                return False
            if "lt" in rng and not size < rng["lt"]:
                return False
            return True

        def in_slice(_id: str, body: Optional[dict]) -> bool:
            sl = (body or {}).get("slice")
            if not sl:
                return True
            return zlib.crc32(_id.encode()) % int(sl["max"]) == int(sl["id"])

        @app.post("/<index>/<doc_type>/_search")
        @app.post("/<index>/_search", defaults={"doc_type": None})
        def search(index, doc_type):
            with self._lock:
                if self.fail_first_searches > 0:
                    self.fail_first_searches -= 1
                    return {"error": {"type": "injected_search_failure"}}, 500
            size = int(request.args.get("size", "10"))
            body = request.get_json(silent=True)
            # honor source filtering: "_source": false omits the body
            # from every hit (metadata-only scans must actually work
            # without it, not just request it)
            with_source = (body or {}).get("_source", True) is not False
            with self._lock:  # snapshot: concurrent _bulk mutates docs
                # None-safe sort: typeless (8.x) and typed docs can
                # coexist in one store and tuples with None don't order
                doc_items = sorted(
                    self.docs.items(),
                    key=lambda kv: (kv[0][0], kv[0][1] or "", kv[0][2]),
                )
            import copy as _copy

            # DEEP-copy sources into the scroll snapshot: real ES
            # scrolls are point-in-time — aliasing the live doc dicts
            # would let a concurrent bulk update mutate not-yet-served
            # pages, validating engine behavior real ES would reject
            # real-ES mapper-size contract: _size is NOT hit metadata —
            # it appears under hits[].fields ONLY when the request asks
            # (docvalue_fields on 5+, fields pre-5). Serving it
            # unconditionally at top level masked engines that forget
            # the ask and would read all-NULL sizes on a live cluster.
            asked = set((body or {}).get("docvalue_fields") or ()) | set(
                (body or {}).get("fields") or ()
            )
            wants_size = "_size" in asked
            hits = [
                {
                    "_index": ix,
                    # real ES 8 search hits carry NO _type (mapping
                    # types removed) — serving one would let the engine
                    # ship it back in bulk actions an 8.x cluster rejects
                    **({"_type": t} if self.major < 8 else {}),
                    "_id": _id,
                    **({"_source": _copy.deepcopy(src)} if with_source else {}),
                    **(
                        {"fields": {"_size": [src.get("__size")]}}
                        if wants_size and src.get("__size") is not None
                        else {}
                    ),
                }
                for (ix, t, _id), src in doc_items
                if ix == index
                and (doc_type is None or t == doc_type)
                and matches(_id, src.get("__size"), body)
                and in_slice(_id, body)
            ]
            sid = uuid.uuid4().hex
            with self._lock:
                self.scrolls[sid] = {
                    "rest": hits[size:], "total": len(hits), "size": size,
                    "slice": (body or {}).get("slice"),
                    # continuation pages must report totals the same way
                    # the original request asked for them
                    "track": (body or {}).get("track_total_hits") is True,
                }
            return {
                "_scroll_id": sid,
                "hits": {"total": self._total(len(hits), body), "hits": hits[:size]},
            }

        @app.post("/_search/scroll")
        def scroll():
            body = request.get_json()
            with self._lock:
                st = self.scrolls.get(body["scroll_id"])
                if st is None or st.get("cleared"):
                    # real ES: a cleared/expired context is a 404, not
                    # more pages — an engine that clears too early must
                    # FAIL here, not silently keep scanning
                    return {
                        "error": {"type": "search_context_missing_exception"}
                    }, 404
                page, st["rest"] = st["rest"][: st["size"]], st["rest"][st["size"]:]
                total = self._total(
                    st["total"],
                    {"track_total_hits": True} if st.get("track") else None,
                )
            return {
                "_scroll_id": body["scroll_id"],
                "hits": {"total": total, "hits": page},
            }

        @app.delete("/_search/scroll")
        def clear_scroll():
            body = request.get_json(silent=True) or {}
            sids = body.get("scroll_id", [])
            if isinstance(sids, str):
                sids = [sids]
            n = 0
            with self._lock:
                for sid in sids:
                    if sid in self.scrolls:
                        self.scrolls[sid]["cleared"] = True
                        self.cleared_scrolls.append(sid)
                        n += 1
            return {"succeeded": True, "num_freed": n}

        @app.post("/_bulk")
        def bulk():
            payload = request.get_data(as_text=True)
            if self.major >= 8:
                # real ES 8 removed mapping types: an action metadata
                # line carrying _type fails the WHOLE bulk request with
                # a 400 ("unknown parameter [_type]") — a cross-version
                # transfer into an 8.x destination must ship typeless
                # actions, and the fixture must refuse rather than
                # silently absorb what a real cluster rejects
                for line in payload.splitlines():
                    if not line:
                        continue
                    parsed = json.loads(line)
                    act = set(parsed) & {"update", "delete", "index", "create"}
                    if act and "_type" in parsed[act.pop()]:
                        return {
                            "error": {
                                "type": "illegal_argument_exception",
                                "reason": "Action/metadata line contains "
                                "an unknown parameter [_type]",
                            }
                        }, 400
            with self._lock:
                self.bulk_bodies.append(payload)
                if self.reject_http_remaining > 0:
                    self.reject_http_remaining -= 1
                    return {
                        "error": {
                            "type": "es_rejected_execution_exception",
                            "reason": "bulk queue is full",
                        }
                    }, 429
                if self.reject_remaining > 0:
                    self.reject_remaining -= 1
                    # real-ES shape: one item PER op, each rejected
                    n_ops = sum(
                        1
                        for line in payload.splitlines()
                        if line and set(json.loads(line)) & {"update", "delete", "index", "create"}
                    )
                    return {
                        "errors": True,
                        "items": [
                            {"update": {"status": 429, "error": {
                                "type": "es_rejected_execution_exception"}}}
                        ] * max(n_ops, 1),
                    }
                lines = [json.loads(line) for line in payload.splitlines() if line]
                items = []
                errors = False
                i = 0
                while i < len(lines):
                    action = lines[i]
                    if "delete" in action:  # action-only line, no doc follows
                        meta = action["delete"]
                        assert "_type" not in meta or meta["_type"] is not None
                        if str(meta["_id"]) in self.reject_once_ids:
                            self.reject_once_ids.discard(str(meta["_id"]))
                            items.append({"delete": {
                                "status": 429,
                                "error": {"type": "es_rejected_execution_exception"},
                            }})
                            errors = True
                            i += 1
                            continue
                        if str(meta["_id"]) in self.fail_delete_ids:
                            items.append({"delete": {
                                "status": 400,
                                "error": {"type": "mapper_parsing_exception"},
                            }})
                            errors = True
                            i += 1
                            continue
                        key = (meta["_index"], meta.get("_type"), str(meta["_id"]))
                        found = self.docs.pop(key, None) is not None
                        if self.major < 5:
                            # ES 1.x-4.x delete items carry found:
                            # true/false and NO 'result' key
                            items.append({"delete": {
                                "status": 200 if found else 404,
                                "found": found,
                            }})
                        else:
                            items.append({"delete": {
                                "status": 200 if found else 404,
                                "result": "deleted" if found else "not_found",
                            }})
                        i += 1
                        continue
                    meta = action["update"]
                    doc = lines[i + 1]
                    key = (meta["_index"], meta.get("_type"), str(meta["_id"]))
                    # per-item backpressure applies to EVERY op kind —
                    # restricted to deletes, an upsert-path partial-
                    # rejection test would pass vacuously
                    if str(meta["_id"]) in self.reject_once_ids:
                        self.reject_once_ids.discard(str(meta["_id"]))
                        items.append({"update": {
                            "status": 429,
                            "error": {"type": "es_rejected_execution_exception"},
                        }})
                        errors = True
                        i += 2
                        continue
                    assert doc.get("doc_as_upsert") is True  # the S4 contract
                    existing = self.docs.get(key, {})
                    existing.update(doc["doc"])  # partial-doc merge semantics
                    self.docs[key] = existing
                    items.append({"update": {"status": 200}})
                    i += 2
                return {"errors": errors, "items": items}

        return app

    # ---------------------------------------------------------- server
    def start(self) -> str:
        wsgi = self.app
        if self.path_prefix:
            wsgi = DispatcherMiddleware(NotFound(), {self.path_prefix: self.app})
        # threaded: executor tasks scroll their slices concurrently
        self._server = make_server("127.0.0.1", 0, wsgi, threaded=True)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return f"http://127.0.0.1:{self._server.server_port}{self.path_prefix}"

    def stop(self) -> None:
        if self._server:
            self._server.shutdown()
            self._thread.join(timeout=5)
