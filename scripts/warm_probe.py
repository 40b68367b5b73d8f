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
import statistics
import sys
import time

import os
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
            dt = run(n)
            times[n].append(dt)
            print(f"# round {r + 1}/{rounds} {n}: {dt:.2f}s", file=sys.stderr)
        probes.append(calibrate(spark))
    med = {n: round(statistics.median(v), 3) for n, v in times.items()}
    print(json.dumps({
        "sf_dir": sf_dir,
        "medians": dict(sorted(med.items(), key=lambda kv: -kv[1])),
        "raw": times,
        "probes": [round(p, 3) for p in probes],
    }))


if __name__ == "__main__":
    main()
