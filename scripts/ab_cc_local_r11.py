#!/usr/bin/env python
"""In-process interleaved A/B for the r11 CC small-graph fast path:
every CC-consuming query runs alternately with the fast path ON
(default cap) and OFF (CHILLASTIC_CC_LOCAL_CAP=0 → the distributed
loop), in ONE Spark session — ambient drift hits both arms equally.
Outputs must be identical between arms every rep (checked via sorted
row hash). Medians per arm reported.

Usage: python scripts/ab_cc_local_r11.py [reps]
"""
from __future__ import annotations

import hashlib
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chillastic_spark.persist import batch_scope
from chillastic_spark.queries import all_queries
from chillastic_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
QUERIES = [
    "leakage_safe_splits",
    "shard_manifest",
    "splits_incremental",
    "semantic_dedup_manifest",
    "dedup_clusters",
    "dedup_keep_best",
]


def run_once(spark, fn, arm: str):
    if arm == "loop":
        os.environ["CHILLASTIC_CC_LOCAL_CAP"] = "0"
    else:
        os.environ.pop("CHILLASTIC_CC_LOCAL_CAP", None)
    try:
        with batch_scope():
            t = time.time()
            df = fn(spark, SF)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t
            rows = sorted(map(str, df.collect()))
            h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
        return dt, h
    finally:
        os.environ.pop("CHILLASTIC_CC_LOCAL_CAP", None)


def main() -> None:
    spark = get_spark("ab-cc-local-r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # warmup both arms once
    for n in QUERIES:
        for arm in ("fast", "loop"):
            spark.sparkContext.setJobDescription(f"warmup {n} {arm}")
            run_once(spark, qs[n].fn, arm)
    out = {}
    for n in QUERIES:
        times = {"fast": [], "loop": []}
        hashes = set()
        for rep in range(REPS):
            for arm in ("loop", "fast") if rep % 2 else ("fast", "loop"):
                spark.sparkContext.setJobDescription(f"rep{rep} {n} {arm}")
                dt, h = run_once(spark, qs[n].fn, arm)
                times[arm].append(round(dt, 3))
                hashes.add(h)
        ident = len(hashes) == 1
        out[n] = {
            "fast_med": statistics.median(times["fast"]),
            "loop_med": statistics.median(times["loop"]),
            "ratio": round(
                statistics.median(times["fast"])
                / statistics.median(times["loop"]),
                3,
            ),
            "identical_outputs": ident,
            "fast": times["fast"],
            "loop": times["loop"],
        }
        print(f"# {n}: {out[n]}", file=sys.stderr)
        assert ident, f"{n}: arms diverged!"
    print(json.dumps({"sf_dir": SF, "reps": REPS, "queries": out}))


if __name__ == "__main__":
    main()
