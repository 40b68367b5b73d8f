#!/usr/bin/env python
"""Core-scaling measurement at sf1 (r10 verdict item 8): at sf0.1
every headliner is job-overhead-bound, so the driver's 8-vs-32-core
block cannot distinguish a serial engine from an overhead-bound one
(all r10 ratios sat at 0.86–1.36 against an ideal ~4). At sf1 the map
work dominates and the ratio can actually move.

Runs the scan-fan-out beneficiaries (the queries whose r10 win was
parallelizing heavy map work) at ONE core count per process —
SPARK_GRAFT_CPUS is honored through chillastic_spark.session, exactly
as the driver sets it. Run twice (32 then 8), then combine:

  SPARK_GRAFT_CPUS=32 python scripts/scaling_sf1_r11.py run out32.json
  SPARK_GRAFT_CPUS=8  python scripts/scaling_sf1_r11.py run out8.json
  python scripts/scaling_sf1_r11.py combine out32.json out8.json

combine writes SCALING_sf1_r11.json with per-query t8/t32 ratios.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# SPARK_GRAFT_SCALE_DIR overrides (e.g. .scale/sf10 — where per-job
# fixed overhead stops masking the compute; at sf1 it was still 60-80%
# of wall, see SCALING_sf1_r11.json / OPTIMIZATION_r11.md)
SF1 = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", os.path.join(ROOT, ".scale", "sf1")
)
WARM = "/root/testdata/sf0.001"
QUERIES = (
    os.environ.get("SPARK_GRAFT_SCALE_QUERIES", "").split(",")
    if os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    else [
        "text_features",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_incremental",
        "similarity_topk",
        "table_profile",
        "q1_pricing_summary",
    ]
)
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def run(out_path: str) -> None:
    from chillastic_spark.persist import batch_scope
    from chillastic_spark.queries import all_queries
    from chillastic_spark.session import calibrate, get_spark

    spark = get_spark("scaling-sf1-r11")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    qs = all_queries()
    for n in QUERIES:  # codegen warmup at the small SF, then sf1 warm
        for sf in (WARM, SF1):
            with batch_scope():
                qs[n].fn(spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
    probes = [calibrate(spark)]
    rounds: list = []
    for r in range(N_RUNS):
        times = {}
        for n in QUERIES:
            spark.sparkContext.setJobDescription(f"sf1 cpus={cpus} {n} r{r}")
            with batch_scope():
                t0 = time.time()
                qs[n].fn(spark, SF1).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[n] = round(time.time() - t0, 3)
        rounds.append(times)
        probes.append(calibrate(spark))
        print(f"# round {r}: {times}", file=sys.stderr)
    med = {
        n: round(statistics.median([r[n] for r in rounds]), 3)
        for n in QUERIES
    }
    payload = {
        "cpus": cpus,
        "sf_dir": SF1,
        "medians": med,
        "rounds": rounds,
        "calibration_samples": [round(p, 3) for p in probes],
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


def combine(p32: str, p8: str) -> None:
    a, b = json.load(open(p32)), json.load(open(p8))
    assert a["cpus"] == "32" and b["cpus"] == "8", (a["cpus"], b["cpus"])
    ratios = {
        n: round(b["medians"][n] / a["medians"][n], 2)
        for n in a["medians"]
    }
    payload = {
        "metric": "core_scaling_sf1_t8_over_t32",
        "sf_dir": a["sf_dir"],
        "medians_32": a["medians"],
        "medians_8": b["medians"],
        "ratio_8_over_32": ratios,
        "calibration_32": a["calibration_samples"],
        "calibration_8": b["calibration_samples"],
        "note": (
            "t(8 cores)/t(32 cores) at sf1 — ideal 4.0 for perfectly "
            "parallel map work; sf0.1 ratios are overhead-bound and "
            "uninformative (r10 PERF scaling block)."
        ),
    }
    tag = os.path.basename(a["sf_dir"].rstrip("/"))
    out = os.path.join(ROOT, f"SCALING_{tag}_r11.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    print(f"written: {out}", file=sys.stderr)


if __name__ == "__main__":
    if sys.argv[1] == "run":
        run(sys.argv[2])
    else:
        combine(sys.argv[2], sys.argv[3])
