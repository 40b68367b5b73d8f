"""In-process Elasticsearch wire fixture for the contract e2e tests.

Speaks the minimal subset of the ES HTTP API the reference engine uses
(transfer.js:79-151, 159-189): ``_search?scroll&size`` with an optional
``_size``-range body, ``_search/scroll`` continuation, and ``_bulk``
doc_as_upsert NDJSON. Backed by a dict; records every bulk payload so
tests can assert the exact bytes on the wire. ``reject_first_bulks=N``
makes the first N bulk calls answer with
``es_rejected_execution_exception`` items to exercise the reference's
retry/backoff contract.
"""
from __future__ import annotations

import json
import threading
import uuid
from typing import Optional

from flask import Flask, request
from werkzeug.serving import make_server


class FakeES:
    def __init__(self, reject_first_bulks: int = 0):
        # {(index, type, id): source}
        self.docs: dict[tuple, dict] = {}
        self.index_cfgs: dict[str, dict] = {}
        self.templates: dict[str, dict] = {}
        self.bulk_bodies: list[str] = []
        self.scrolls: dict[str, dict] = {}
        self.reject_remaining = reject_first_bulks
        self.app = self._build()
        self._server = None
        self._thread = None

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
        return {
            _id: src for (ix, _t, _id), src in self.docs.items() if ix == index
        }

    # ------------------------------------------------------------- app
    def _build(self) -> Flask:
        import fnmatch

        app = Flask("fake-es")

        @app.get("/")
        def root():  # cluster-info ping
            return {"cluster_name": "fake-es", "version": {"number": "5.6.0"}}

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
            if not body:
                return True
            q = body["query"]
            if "ids" in q:
                return _id in q["ids"]["values"]
            rng = q["range"]["_size"]
            size = src_size if src_size is not None else 0
            if "gte" in rng and not size >= rng["gte"]:
                return False
            if "lt" in rng and not size < rng["lt"]:
                return False
            return True

        @app.post("/<index>/<doc_type>/_search")
        @app.post("/<index>/_search", defaults={"doc_type": None})
        def search(index, doc_type):
            size = int(request.args.get("size", "10"))
            body = request.get_json(silent=True)
            hits = [
                {
                    "_index": ix,
                    "_type": t,
                    "_id": _id,
                    "_source": src,
                    "_size": src.get("__size"),
                }
                for (ix, t, _id), src in sorted(self.docs.items())
                if ix == index
                and (doc_type is None or t == doc_type)
                and matches(_id, src.get("__size"), body)
            ]
            sid = uuid.uuid4().hex
            self.scrolls[sid] = {"rest": hits[size:], "total": len(hits), "size": size}
            return {
                "_scroll_id": sid,
                "hits": {"total": len(hits), "hits": hits[:size]},
            }

        @app.post("/_search/scroll")
        def scroll():
            body = request.get_json()
            st = self.scrolls[body["scroll_id"]]
            page, st["rest"] = st["rest"][: st["size"]], st["rest"][st["size"]:]
            return {
                "_scroll_id": body["scroll_id"],
                "hits": {"total": st["total"], "hits": page},
            }

        @app.post("/_bulk")
        def bulk():
            payload = request.get_data(as_text=True)
            self.bulk_bodies.append(payload)
            lines = [json.loads(line) for line in payload.splitlines() if line]
            if self.reject_remaining > 0:
                self.reject_remaining -= 1
                return {
                    "errors": True,
                    "items": [
                        {"update": {"status": 429, "error": {
                            "type": "es_rejected_execution_exception"}}}
                    ],
                }
            items = []
            i = 0
            while i < len(lines):
                action = lines[i]
                if "delete" in action:  # action-only line, no doc follows
                    meta = action["delete"]
                    key = (meta["_index"], meta["_type"], str(meta["_id"]))
                    found = self.docs.pop(key, None) is not None
                    items.append({"delete": {
                        "status": 200 if found else 404,
                        "result": "deleted" if found else "not_found",
                    }})
                    i += 1
                    continue
                meta = action["update"]
                doc = lines[i + 1]
                key = (meta["_index"], meta.get("_type"), str(meta["_id"]))
                assert doc.get("doc_as_upsert") is True  # the S4 contract
                existing = self.docs.get(key, {})
                existing.update(doc["doc"])  # partial-doc merge semantics
                self.docs[key] = existing
                items.append({"update": {"status": 200}})
                i += 2
            return {"errors": False, "items": items}

        return app

    # ---------------------------------------------------------- server
    def start(self) -> str:
        self._server = make_server("127.0.0.1", 0, self.app)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return f"http://127.0.0.1:{self._server.server_port}"

    def stop(self) -> None:
        if self._server:
            self._server.shutdown()
            self._thread.join(timeout=5)
