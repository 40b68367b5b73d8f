#!/usr/bin/env python
"""In-process interleaved A/B for the lineitem fan-out OPT-INS
(r10 verdict item 3 / r11 item 4): q1_pricing_summary and
table_profile with the call-site fanout=True as shipped vs stripped
(everything else identical — the documents/embeddings defaults stay).
Run once with SPARK_GRAFT_CPUS=32 and once with 8 so the decision
covers both driver regimes.

Usage: SPARK_GRAFT_CPUS=N python scripts/ab_fanout_optin_r11.py [reps]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chillastic_spark.persist import batch_scope
from chillastic_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> None:
    import chillastic_spark.queries.analytics9 as A9
    import chillastic_spark.queries.relational as R
    import chillastic_spark.tables as T

    spark = get_spark("ab-fanout-optin-r11")
    spark.sparkContext.setLogLevel("ERROR")

    orig_load = T.load

    def stripped_load(spark, sf_dir, name, fanout=None):
        # strip CALL-SITE opt-ins only; the documents/embeddings
        # defaults (fanout=None) are not under test here
        return orig_load(spark, sf_dir, name, False if fanout else fanout)

    queries = {
        "q1_pricing_summary": (R, "q1_pricing_summary"),
        "table_profile": (A9, "table_profile"),
    }

    def run(mod, fn_name, arm):
        mod.load = stripped_load if arm == "plain" else orig_load
        try:
            with batch_scope():
                t = time.time()
                getattr(mod, fn_name)(spark, SF).write.format("noop").mode(
                    "overwrite"
                ).save()
                return time.time() - t
        finally:
            mod.load = orig_load

    for name, (mod, fn) in queries.items():
        for arm in ("optin", "plain"):
            run(mod, fn, arm)  # warm
    out = {}
    for name, (mod, fn) in queries.items():
        times = {"optin": [], "plain": []}
        for rep in range(REPS):
            for arm in ("plain", "optin") if rep % 2 else ("optin", "plain"):
                spark.sparkContext.setJobDescription(f"{name} {arm} rep{rep}")
                times[arm].append(round(run(mod, fn, arm), 3))
        om, pm = (statistics.median(times[a]) for a in ("optin", "plain"))
        out[name] = {
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "?"),
            "optin_med": om,
            "plain_med": pm,
            "ratio_optin_over_plain": round(om / pm, 3),
            "optin": times["optin"],
            "plain": times["plain"],
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF, "reps": REPS, "queries": out}))


if __name__ == "__main__":
    main()
