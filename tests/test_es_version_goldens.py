"""Per-major ES wire-request goldens — the sandbox substitute for the
reference's live two-cluster CI matrix (.circleci/config.yml:5-24,
which runs the whole suite against ES 2.x and 5.x clusters).

One fixed operation sequence is driven through the full client stack
(ESStore + scan + bulk) against the in-process fixture reporting each
major version; EVERY request the client emits (method, path,
content-type, body) is normalized and pinned to a golden file. Any
regression in the version gates — sliced scroll (>= 5),
track_total_hits (>= 7), typeless bulk metadata, scroll keep-alive,
settings stripping — shows up as a golden diff for the exact major it
breaks.

Regenerate after an INTENDED wire change:
    CHILLASTIC_UPDATE_GOLDENS=1 python -m pytest tests/test_es_version_goldens.py
then review the golden diff like any code change.
"""
import json
import os
import re

import pytest

from chillastic_spark.sources import es_rest
from chillastic_spark.sources.es_rest import ESStore
from es_fixture import FakeES

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# one representative patch release per supported major
VERSIONS = {
    2: "2.4.6",
    5: "5.6.16",
    6: "6.8.23",
    7: "7.17.9",
    8: "8.11.4",
}

_UUID = re.compile(
    r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
    r"|[0-9a-f]{32}"
)


def _normalize(entry: dict) -> dict:
    body = entry["body"] or ""
    body = _UUID.sub("<SCROLL_ID>", body)
    path = _UUID.sub("<SCROLL_ID>", entry["path"])
    return {
        "method": entry["method"],
        "path": path,
        "kind": entry["kind"],
        "content_type": entry["content_type"],
        "body": body,
    }


def drive(es: FakeES, url: str) -> None:
    """The fixed sequence: probe, catalog both directions, templates
    both directions, planning count with a _size range, a (possibly
    sliced) scan at page size 3, a doc_as_upsert bulk with and without
    a _type, and an ids purge."""
    es.seed("ix", "t1", {f"d{i}": {"v": i, "_size": 50} for i in range(6)})
    es.seed_template("tpl", {"index_patterns": ["ix*"]})
    store = ESStore(url, slices=2)
    assert store.reachable()
    store.get_indices("ix*")
    store.put_indices(
        [{
            "name": "ix2",
            "settings": {
                "index": {
                    "uuid": "KEEP-ME-OUT",  # must be stripped
                    "number_of_shards": "1",
                }
            },
            "warmers": {},
        }]
    )
    store.get_templates("tpl")
    store.put_templates([{"name": "tpl2", "index_patterns": ["zz*"]}])
    store.count(None, "ix", "t1", min_size=10, max_size=99)
    n = es_rest._resolve_slices(store.wire, 2, None)
    for sid in range(n):
        list(
            es_rest.scan(
                store.wire,
                "ix",
                "t1",
                flush_size=3,
                slice_id=sid if n > 1 else None,
                slice_max=n if n > 1 else None,
            )
        )
    lines = []
    for d in (
        # ES 8 removed mapping types: a real 8.x cluster 400s any bulk
        # action carrying _type (the fixture now enforces this), and a
        # real 8.x SOURCE never serves one — so the typed doc only
        # exists on pre-8 wires, exactly like a real deployment
        {"_index": "ix", "_type": "t1" if es.major < 8 else None,
         "_id": "a", "_source": {"v": 1}},
        {"_index": "ix2", "_type": None, "_id": "b", "_source": {"v": 2}},
    ):
        lines.extend(es_rest.doc_to_bulk(d))
    es_rest._send_bulk(store.wire, lines, 2)
    store.purge(None, "ix", ["d1"])


@pytest.mark.parametrize("major", sorted(VERSIONS))
def test_wire_requests_match_golden(major):
    es = FakeES(version=VERSIONS[major])
    url = es.start()
    try:
        drive(es, url)
    finally:
        es.stop()
    got = [_normalize(r) for r in es.request_log]

    path = os.path.join(GOLDEN_DIR, f"es_wire_v{major}.json")
    if os.environ.get("CHILLASTIC_UPDATE_GOLDENS"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(got, f, indent=1)
        return
    with open(path) as f:
        want = json.load(f)
    assert got == want, (
        f"wire traffic drifted from the v{major} golden; if intended, "
        "regenerate with CHILLASTIC_UPDATE_GOLDENS=1 and review the diff"
    )


def test_goldens_pin_the_version_gates():
    """The gates themselves, asserted ACROSS the golden files so a
    regenerated-but-wrong golden still fails: slice bodies only on
    >= 5, track_total_hits only on >= 7, scroll keep-alive everywhere."""
    goldens = {
        m: json.load(open(os.path.join(GOLDEN_DIR, f"es_wire_v{m}.json")))
        for m in sorted(VERSIONS)
    }
    for major, reqs in goldens.items():
        searches = [r for r in reqs if r["kind"] == "search" and "scroll=" in r["path"]]
        counts = [r for r in reqs if r["kind"] == "search" and "size=0" in r["path"]]
        scrolls = [r for r in reqs if r["kind"] == "scroll"]
        assert searches and counts, major
        has_slice = any('"slice"' in r["body"] for r in searches)
        assert has_slice == (major >= 5), major
        has_track = any('"track_total_hits"' in r["body"] for r in counts)
        assert has_track == (major >= 7), major
        # exact-total shortcut (>= 5 here: fixture totals are exact ints
        # below 7 and eq-relation objects at 7+) means the drain needs
        # no trailing empty-page scroll; every continuation keeps the
        # reference's 1h keep-alive
        for r in scrolls:
            assert '"scroll": "1h"' in r["body"] or '"scroll":"1h"' in r["body"], major
        # stripped non-portable settings never travel
        for r in reqs:
            assert "KEEP-ME-OUT" not in r["body"], major
        # bulk metadata: the None-_type doc must be typeless
        bulks = [r for r in reqs if r["kind"] == "bulk"]
        assert any(
            '{"update":{"_index":"ix2","_id":"b"}}' in r["body"] for r in bulks
        ), major
        # mapping-type removal (ES 8): pre-8 wires carry the typed
        # update AND the type-recovered delete actions; the 8.x wire
        # must be entirely typeless (a real 8.x cluster 400s otherwise,
        # and 8.x search hits — where purge recovers types — have none)
        has_type = any('"_type"' in r["body"] for r in bulks)
        assert has_type == (major < 8), major
        # mapper-size ask: _size is not hit metadata on a real cluster —
        # every scan must request it (docvalue_fields on 5+, the legacy
        # 'fields' spelling pre-5) or sizes read NULL and size-bucket
        # planning degenerates
        key = "fields" if major < 5 else "docvalue_fields"
        for r in searches:
            assert f'"{key}": ["_size"]' in r["body"], (major, r["body"])
