#!/usr/bin/env python
"""ANN serving operating curves, HELD-OUT, on BOTH embedding regimes
(r9 verdict #1).

r9 established two things the hard way:

* TRAIN/TEST CONTAMINATION — recall queries drawn from the quantizer's
  own smallest-xxhash64 training sample over-measured recall (0.88
  apparent vs 0.26 held-out at a 9% scan; preserved in
  SWEEP_ann_r09.json `contamination_check`). All queries here are the
  32 LARGEST-xxhash64 clean vectors — provably disjoint from the
  4096-smallest training sample.
* The synthetic sf* corpora are ISOTROPIC, so held-out IVF recall
  tracks the scanned fraction — there is no structure to exploit, and
  the floor-honest default (nprobe = cells/2) is forced.

r10 adds the missing half: the SAME held-out measurement on a corpus
WITH cluster structure (scripts/make_clustered.py — a 32-component
mixture at sf1 scale, the realistic embedding regime), via
operators.similarity.ivf_recall_curve — one Spark job per (corpus,
n_cells) yielding EXACT recall at every nprobe (the per-cell top-k is
a sufficient statistic; nprobe = n_cells IS brute force). The
calibrate_nprobe helper then picks the smallest nprobe meeting the
0.8 floor per corpus — the measured, per-corpus path to a serving
config below the floor default.

Writes SWEEP_ann_r{N}.json and prints one JSON line.
Usage: python scripts/sweep_ann.py
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF1 = os.path.join(ROOT, ".scale", "sf1")
CLUSTERED = os.path.join(ROOT, ".scale", "clustered")
K = 10
N_QUERIES = 32
TARGET = 0.8


def _got_map(rows) -> dict:
    got: dict = {}
    for r in rows:
        got.setdefault(r[0], set()).add(r[1])
    return got


def _recall(got: dict, want: dict) -> float:
    hits = tot = 0
    for qid, truth in want.items():
        tot += len(truth)
        hits += len(truth & got.get(qid, set()))
    return hits / tot if tot else 0.0


def main() -> int:
    if not os.path.isdir(SF1):
        raise SystemExit("sf1 missing — run scripts/make_sf1.py first")
    if not os.path.isdir(CLUSTERED):
        raise SystemExit(
            "clustered corpus missing — run scripts/make_clustered.py first"
        )
    from pyspark.sql import functions as F

    from chillastic_spark.operators import similarity as S
    from chillastic_spark.session import get_spark
    from chillastic_spark.tables import load

    spark = get_spark("sweep-ann")
    spark.sparkContext.setLogLevel("ERROR")

    corpora = {
        "isotropic_sf1": load(spark, SF1, "embeddings"),
        "clustered_mixture": spark.read.parquet(
            os.path.join(CLUSTERED, "embeddings.parquet")
        ),
    }
    out: dict = {}
    for name, e in corpora.items():
        n_corpus = e.count()
        t0 = time.time()
        cal = S.calibrate_nprobe(
            e, target_recall=TARGET, k=K, n_queries=N_QUERIES
        )
        sec = round(time.time() - t0, 1)
        curve = cal.pop("curve")
        out[name] = {
            "corpus_rows": n_corpus,
            "calibrated": cal,
            "sec": sec,
            # the whole exact curve, thinned for the artifact
            "curve": [
                p
                for i, p in enumerate(curve)
                if i < 8 or (i + 1) % 4 == 0 or p["nprobe"] == cal["nprobe"]
            ],
        }
        print(f"# {name}: {cal} ({sec}s)", file=sys.stderr)

    # structure sensitivity on the clustered corpus: the calibrated
    # scan fraction must hold across cell-count choices, not be a
    # one-cell-count artifact
    e = corpora["clustered_mixture"]
    cells_scan = {}
    for n_cells in (16, 64):
        cal = S.calibrate_nprobe(
            e, target_recall=TARGET, k=K, n_cells=n_cells, n_queries=N_QUERIES
        )
        cal.pop("curve")
        cells_scan[n_cells] = cal
        print(f"# clustered n_cells={n_cells}: {cal}", file=sys.stderr)

    # IVF-PQ at the calibrated clustered config: the compressed path
    # must keep the floor where the uncompressed one does
    pick = out["clustered_mixture"]["calibrated"]
    qset = (
        S.clean_vectors(e)
        .orderBy(F.desc(F.xxhash64(F.col("vec_id"))), F.col("vec_id"))
        .limit(N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    want = _got_map(S.brute_force_topk_fast(e, qset, k=K).collect())
    t0 = time.time()
    got = _got_map(
        S.ivf_pq_topk(
            e,
            qset,
            k=K,
            n_cells=pick["n_cells"],
            nprobe=pick["nprobe"],
            m=16,
            n_centroids=256,
            refine=10,
        ).collect()
    )
    ivf_pq = {
        "n_cells": pick["n_cells"],
        "nprobe": pick["nprobe"],
        "m": 16,
        "refine": 10,
        "recall_at_10": round(_recall(got, want), 3),
        "sec": round(time.time() - t0, 1),
    }
    print(f"# clustered ivf_pq: {ivf_pq}", file=sys.stderr)

    # r11: the calibration wired into the IVF index LIFECYCLE — build
    # on the clustered corpus (build-time held-out calibration against
    # the persisted centroids), then serve at the index's own default
    # (nprobe=None → calibrated_nprobe). This is the registered serving
    # path's measured per-corpus scan fraction.
    import tempfile

    from chillastic_spark.sources.vector_index import (
        ann_query_ivf_index,
        build_ivf_index,
    )

    idx_dir = tempfile.mkdtemp(prefix="sweep-ivf-idx-")
    t0 = time.time()
    meta = build_ivf_index(e, idx_dir)
    build_sec = round(time.time() - t0, 1)
    t0 = time.time()
    served = _got_map(
        ann_query_ivf_index(spark, idx_dir, qset, k=K).collect()
    )
    lifecycle = {
        "n_cells": meta["n_cells"],
        "calibrated_nprobe": meta["calibrated_nprobe"],
        "calibration": meta["calibration"],
        "serving_recall_at_10_at_default": round(_recall(served, want), 3),
        "scan_frac_at_default": round(
            (meta["calibrated_nprobe"] or 0) / meta["n_cells"], 4
        ),
        "build_sec": build_sec,
        "serve_sec": round(time.time() - t0, 1),
    }
    print(f"# clustered index lifecycle: {lifecycle}", file=sys.stderr)

    payload = {
        "metric": "ann_operating_curves_held_out",
        "k": K,
        "n_queries": N_QUERIES,
        "target_recall": TARGET,
        "query_selection": "32 largest-xxhash64 clean vectors — disjoint "
        "from the quantizer's 4096-smallest training sample (the r9 "
        "contamination fix, measured in SWEEP_ann_r09.contamination_check)",
        "corpora": out,
        "clustered_cells_sensitivity": cells_scan,
        "clustered_ivf_pq_at_calibrated": ivf_pq,
        "clustered_index_lifecycle": lifecycle,
        "note": (
            "Exact per-nprobe recall from ivf_recall_curve (per-cell "
            "top-k sufficient statistic; nprobe=n_cells IS brute force). "
            "The isotropic corpus pins recall to scan_frac — the floor-"
            "honest default (nprobe=cells/2) remains correct there. The "
            "clustered corpus (32-component mixture, make_clustered.py) "
            "is the regime IVF exists for: calibrate_nprobe reads the "
            "serving config off the measured curve instead of assuming "
            "structure."
        ),
    }
    print(json.dumps(payload))
    rounds = [
        int(m.group(1))
        for f in os.listdir(ROOT)
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    n = (max(rounds) + 1) if rounds else 0
    path = os.path.join(ROOT, f"SWEEP_ann_r{n:02d}.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"written: {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
