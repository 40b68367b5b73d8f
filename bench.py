#!/usr/bin/env python
"""Per-round bench harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing excludes JVM/session startup (measured once, reported
separately) and uses a cheap count() materialisation per query so the
full plan executes without driver-side collect overhead dominating.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    t0 = time.time()
    from chillastic_spark.queries import all_queries
    from chillastic_spark.session import get_spark

    spark = get_spark("chillastic-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + parquet footer caches with a trivial action
    spark.range(1).count()
    startup = time.time() - t0

    qs = {n: q for n, q in all_queries().items() if q.headline}

    # steady-state measurement: one warmup pass at the smallest SF to
    # compile each plan's codegen before timing the real SF (standard
    # JIT-warm benching; reported in the JSON for transparency)
    warm_dir = "/root/testdata/sf0.001"
    t = time.time()
    if os.path.isdir(warm_dir):
        for name, q in qs.items():
            try:
                q.fn(spark, warm_dir).count()
            except Exception as e:  # noqa: BLE001
                print(f"# warmup {name} failed: {e}", file=sys.stderr)
    warmup = time.time() - t

    timings: dict[str, float] = {}
    for name, q in qs.items():
        t = time.time()
        df = q.fn(spark, SF_DIR)
        n = df.count()  # materialise the full plan
        timings[name] = round(time.time() - t, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "startup_sec": round(startup, 3),
                "warmup_sec": round(warmup, 3),
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
