#!/usr/bin/env python
"""One-off sf1 scaling run (r5 verdict #2): the 8 most expensive
headliners at sf0.1 AND sf1 (10x data, from scripts/make_sf1.py), so
superlinear candidate blowups (prefix postings, band collisions,
interval bins) that sf0.1 cannot expose show up as a wall-time ratio
well above ~10x.

Method mirrors bench.py: sf0.001 warmup compiles codegen, noop-sink
full-plan execution, batch_scope pin release, median of N interleaved
runs per (query, sf), plus the shared calibration probe. Emits ONE
JSON line and writes BENCH_sf1.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_containment_prefix",
    "dedup_incremental",
    "dedup_minhash_lsh",
    "hybrid_search_rrf",
    "q1_pricing_summary",
    "source_unigram_kl",
    "dsir_importance_weights",
    # r7: the block-pair-grid matmul operators. NOTE their candidate
    # spaces are super-10x by construction at sf1 — make_sf1's small
    # per-copy embedding perturbations keep cross-copy cosines above
    # the 0.3 thresholds, so within-label pairs grow ~100x (151,661 vs
    # 1,450 emitted pairs) while wall time is bounded by the grid, not
    # the pair count. Judge the ratio against THAT, not against 10x.
    "embedding_dup_pairs",
    "knn_graph_edges",
]
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
)
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
RATIO_MAX = 15.0  # 10x data + shuffle/agg overhead headroom


def main() -> int:
    from chillastic_spark.persist import batch_scope
    from chillastic_spark.queries import all_queries
    from chillastic_spark.session import calibrate, get_spark

    spark = get_spark("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    qs = {n: all_queries()[n] for n in QUERIES}

    for name, q in qs.items():  # codegen warmup
        with batch_scope():
            q.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()

    calib = [calibrate(spark)]
    samples: dict[str, dict[str, list[float]]] = {
        n: {"sf0.1": [], "sf1": []} for n in QUERIES
    }
    for run in range(N_RUNS):
        for name, q in qs.items():
            for tag, d in (("sf0.1", SF01), ("sf1", SF1)):
                with batch_scope():
                    t = time.time()
                    q.fn(spark, d).write.format("noop").mode("overwrite").save()
                    dt = time.time() - t
                samples[name][tag].append(dt)
                print(f"# run {run + 1}/{N_RUNS} {name}@{tag}: {dt:.2f}s", file=sys.stderr)
    calib.append(calibrate(spark))

    out = {"queries": {}, "ratio_max_allowed": RATIO_MAX,
           "calibration_sec": round(statistics.median(calib), 3),
           "runs_per_point": N_RUNS, "sf1_dir": SF1,
           "metric": "sf1_over_sf0.1_wall_ratio"}
    worst = ("", 0.0)
    for name in QUERIES:
        t01 = statistics.median(samples[name]["sf0.1"])
        t1 = statistics.median(samples[name]["sf1"])
        ratio = t1 / t01
        out["queries"][name] = {
            "sf0.1_sec": round(t01, 3),
            "sf1_sec": round(t1, 3),
            "ratio": round(ratio, 2),
        }
        if ratio > worst[1]:
            worst = (name, ratio)
    out["worst"] = {"query": worst[0], "ratio": round(worst[1], 2)}
    out["ok"] = worst[1] <= RATIO_MAX
    print(json.dumps(out))
    with open(
        os.path.join(os.path.dirname(SF1), "..", "BENCH_sf1.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
