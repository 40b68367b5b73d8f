#!/usr/bin/env python
"""Per-round bench harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed N times (default 3, $SPARK_GRAFT_BENCH_RUNS) in
interleaved rounds — round-robin over the query set, not back-to-back
repeats — so shared-host drift hits every query equally instead of
whichever one it coincides with. The reported per-query figure is the
MEDIAN across rounds; per-query min/max spread is included so a
round-over-round delta can be judged against run-to-run noise.

Timing excludes JVM/session startup (measured once, reported
separately) and uses a cheap count() materialisation per query so the
full plan executes without driver-side collect overhead dominating.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


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
        from chillastic_spark.persist import batch_scope as _bs

        for name, q in qs.items():
            try:
                with _bs():
                    # noop sink so the computed columns' codegen
                    # actually compiles (count() would prune them)
                    q.fn(spark, warm_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
            except Exception as e:  # noqa: BLE001
                print(f"# warmup {name} failed: {e}", file=sys.stderr)
    warmup = time.time() - t

    # shared machine-speed probe (chillastic_spark.session.calibrate),
    # timed before and after the measurement rounds so cross-round
    # comparisons can be de-noised mechanically
    from chillastic_spark.session import calibrate

    calib = [calibrate(spark)]

    from chillastic_spark.persist import batch_scope

    def execute_full(df) -> None:
        # the noop sink executes EVERY operator and discards rows
        # executor-side. count() is NOT a full materialisation:
        # Catalyst prunes all deterministic computed columns under
        # Aggregate(count(1)), so a projection-only query (e.g.
        # text_features) would be timed as a metadata-only row count.
        df.write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {name: [] for name in qs}
    rows: dict[str, int] = {}
    for run in range(N_RUNS):
        for name, q in qs.items():
            # batch_scope: queries that pin intermediates internally
            # (persist.materialize) release them per run — unscoped,
            # the blocks accumulate across warmup + N_RUNS rounds and
            # skew the later interleaved rounds
            with batch_scope():
                t = time.time()
                df = q.fn(spark, SF_DIR)
                execute_full(df)
                dt = time.time() - t
                if name not in rows:
                    rows[name] = df.count()  # untimed, reporting only
            samples[name].append(dt)
            print(
                f"# run {run + 1}/{N_RUNS} {name}: {dt:.2f}s ({rows[name]} rows)",
                file=sys.stderr,
            )

    calib.append(calibrate(spark))

    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    spread = {
        n: [round(min(s), 3), round(max(s), 3)] for n, s in samples.items()
    }
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
                "query_spread": spread,
                "runs_per_query": N_RUNS,
                "sf": sf_val,
                "startup_sec": round(startup, 3),
                "warmup_sec": round(warmup, 3),
                "calibration_sec": round(statistics.median(calib), 3),
                "calibration_samples": [round(c, 3) for c in calib],
                "n_queries": len(timings),
                # measurement method note: rounds 1-5 timed df.count(),
                # which lets Catalyst PRUNE computed columns (projection
                # -only queries timed as metadata row counts; aggregate
                # value expressions skipped). The noop sink executes the
                # full plan — numbers are honest but ~1s higher in total
                # than the old method on identical code.
                "materialize": "noop-sink",
            }
        )
    )


if __name__ == "__main__":
    main()
