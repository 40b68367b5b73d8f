#!/usr/bin/env python
"""Per-query plan snapshots for the r11 optimization round.

Writes plans/r11/<query>_<suffix>.txt — one formatted physical plan
per named query (no names → all headliners) — so a before/after plan
diff backs every optimization claim in OPTIMIZATION_r11.md.

Usage: python scripts/dump_plans_r11.py <before|after> [query ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chillastic_spark.plans import formatted_plan
from chillastic_spark.queries import all_queries
from chillastic_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
)


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), "suffix must be before|after"
    names = sys.argv[2:]
    qs = all_queries()
    if not names:
        names = [n for n, q in qs.items() if q.headline]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plans-r11")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        df = qs[n].fn(spark, SF)
        path = os.path.join(OUT_DIR, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {n} — sf dir {SF} — explain('formatted')\n")
            f.write(formatted_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
