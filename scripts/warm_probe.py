#!/usr/bin/env python
"""Warm interleaved medians for a named query subset — the triage
instrument between time_all (cold single-shot ranking) and bench.py
(the careful headline A/B): one warmup pass at the target SF, then
N interleaved rounds, median per query, calibration probes between
rounds so a loud window is visible.

Usage: python scripts/warm_probe.py <sf_dir> <rounds> <query> [query ...]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

# the chillastic imports below REQUIRE this path mutation — keep it
# immediately above them (ADVICE r10: a reformat that hoisted the
# imports past it would break the script)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chillastic_spark.persist import batch_scope
from chillastic_spark.queries import all_queries
from chillastic_spark.session import calibrate, get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    rounds = int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark("warm-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(f"warm_probe {name}")
        with batch_scope():
            t = time.time()
            qs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t
        spark.sparkContext.setJobDescription(None)
        return dt

    # warmup (untimed)
    for n in names:
        try:
            run(n)
        except Exception as e:  # noqa: BLE001
            print(f"# warmup {n} failed: {e}", file=sys.stderr)

    times: dict[str, list[float]] = {n: [] for n in names}
    probes = [calibrate(spark)]
    for r in range(rounds):
        for n in names:
            # a query that failed warmup (or fails intermittently) must
            # not abort the probe and lose every other query's medians —
            # record the failure, keep collecting (ADVICE r10)
            try:
                dt = run(n)
            except Exception as e:  # noqa: BLE001
                print(f"# round {r + 1}/{rounds} {n} FAILED: {e}",
                      file=sys.stderr)
                continue
            times[n].append(dt)
            print(f"# round {r + 1}/{rounds} {n}: {dt:.2f}s", file=sys.stderr)
        probes.append(calibrate(spark))
    med = {n: round(statistics.median(v), 3) for n, v in times.items() if v}
    failed = sorted(n for n, v in times.items() if not v)
    print(json.dumps({
        "sf_dir": sf_dir,
        "medians": dict(sorted(med.items(), key=lambda kv: -kv[1])),
        "failed": failed,
        "raw": times,
        "probes": [round(p, 3) for p in probes],
    }))


if __name__ == "__main__":
    main()
