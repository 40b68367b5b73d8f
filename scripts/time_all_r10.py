#!/usr/bin/env python
"""One-pass wall timing of EVERY registered query at a given SF dir.

Coverage instrument for the r10 optimization round: the bench times the
22 headliners carefully; this times all ~160 registered queries once
(noop-sink materialisation, batch_scope release, jobs labeled) so the
expensive NON-headline paths are found and examined too, per the
round's "optimize every operator" scope. One run per query — ballpark
ranking, not an A/B instrument (bench.py remains that).

Usage: python scripts/time_all_r10.py [sf_dir] [out_json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chillastic_spark.persist import batch_scope
from chillastic_spark.queries import all_queries
from chillastic_spark.session import calibrate, get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/time_all_r10.json"
    spark = get_spark("time-all-r10")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    c0 = calibrate(spark)
    times: dict[str, float] = {}
    for name, q in all_queries().items():
        spark.sparkContext.setJobDescription(f"time_all: {name}")
        t = time.time()
        try:
            with batch_scope():
                q.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            times[name] = round(time.time() - t, 3)
        except Exception as e:  # noqa: BLE001
            times[name] = -1.0
            print(f"# {name} FAILED: {e}", file=sys.stderr)
        print(f"# {name}: {times[name]}s", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    c1 = calibrate(spark)
    payload = {
        "sf_dir": sf_dir,
        "calibration": [round(c0, 3), round(c1, 3)],
        "total": round(sum(t for t in times.values() if t > 0), 3),
        "times": dict(sorted(times.items(), key=lambda kv: -kv[1])),
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"total": payload["total"], "out": out}))


if __name__ == "__main__":
    main()
