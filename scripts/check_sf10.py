#!/usr/bin/env python
"""sf10 spot-scale of the steepest sf1 scalers (r9 verdict #6).

The sf1 campaign left two queries with the steepest curves on record:
dedup_incremental (4.66x wall across the last 10x decade) and
dedup_simhash (23s at sf1). One more decade (sf10 = 10x sf1 = 100x
the driver's sf0.1, scripts/make_sf10.py) confirms the exponent
before a user finds it: each query runs at sf1 AND sf10 in one
session and the artifact reports wall ratios next to a CANDIDATE-
VOLUME accounting — how much the underlying work actually grew — so
a superlinear wall can be attributed to candidate growth (data-
structural, disclosed) rather than a hidden all-pairs plan.

Accounting per corpus:
* corpus_docs / corpus_tokens — the linear axes;
* minhash band-bucket candidate volume for the pairwise
  (sum over buckets of C(n,2)) and incremental
  (sum of inc x existing per bucket) shapes, computed with the SAME
  operators' banding internals at the registered parameters.

Writes CHECK_sf10_r{N}.json and prints one JSON line.
Usage: python scripts/check_sf10.py
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF1 = os.path.join(ROOT, ".scale", "sf1")
SF10 = os.path.join(ROOT, ".scale", "sf10")

QUERIES = [
    "dedup_incremental",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "simhash_pairs",
]


def _accounting(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from chillastic_spark import functions as CF
    from chillastic_spark.operators import dedup as D
    from chillastic_spark.tables import load

    d = load(spark, sf_dir, "documents")
    base = d.select("doc_id", CF.words("text").alias("__w"))
    row = base.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size("__w")).alias("tokens"),
    ).collect()[0]

    # band-bucket volumes at the registered parameters (n=3, 16 perms,
    # 4 bands — documents.py / analytics8.py)
    sig = D.minhash_signatures_wide(d, n=3, num_perm=16)
    banded = D.minhash_bands(sig, num_perm=16, bands=4)
    pairwise = (
        banded.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("cand"))
        .collect()[0]["cand"]
    )
    inc = banded.join(
        d.select("doc_id", (F.col("doc_id") % 3 == 0).alias("inc")), "doc_id"
    )
    incremental = (
        inc.groupBy("band", "bkey")
        .agg(
            F.sum(F.col("inc").cast("long")).alias("ci"),
            F.sum((~F.col("inc")).cast("long")).alias("ce"),
        )
        .agg(F.sum(F.col("ci") * F.col("ce")).alias("cand"))
        .collect()[0]["cand"]
    )
    return {
        "corpus_docs": row["docs"],
        "corpus_tokens": int(row["tokens"]),
        "minhash_band_candidates_pairwise": int(pairwise or 0),
        "minhash_band_candidates_incremental": int(incremental or 0),
    }


def main() -> int:
    for p in (SF1, SF10):
        if not os.path.isdir(p):
            raise SystemExit(f"{p} missing — run make_sf1/make_sf10 first")
    from chillastic_spark.queries import all_queries
    from chillastic_spark.session import get_spark

    spark = get_spark("check-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()

    out: dict = {"queries": {}, "accounting": {}}
    for name, sf_dir in (("sf1", SF1), ("sf10", SF10)):
        out["accounting"][name] = _accounting(spark, sf_dir)
        print(f"# accounting {name}: {out['accounting'][name]}", file=sys.stderr)
    for q in QUERIES:
        fn = reg[q].fn
        entry = {}
        for name, sf_dir in (("sf1", SF1), ("sf10", SF10)):
            t0 = time.time()
            rows = fn(spark, sf_dir).count()
            entry[name] = {"sec": round(time.time() - t0, 1), "rows": rows}
            print(f"# {q} {name}: {entry[name]}", file=sys.stderr)
        entry["wall_ratio_10x"] = round(
            entry["sf10"]["sec"] / max(entry["sf1"]["sec"], 1e-9), 2
        )
        out["queries"][q] = entry

    acc1, acc10 = out["accounting"]["sf1"], out["accounting"]["sf10"]
    out["accounting"]["growth_10x"] = {
        k: round(acc10[k] / max(acc1[k], 1), 2) for k in acc1
    }
    out["metric"] = "sf10_spot_scale"
    out["note"] = (
        "wall_ratio_10x ~ 10 = linear scaling for a 10x corpus; compare "
        "against the candidate growth row — a wall ratio tracking the "
        "candidate ratio is data-structural, not a plan defect. Runs on "
        "local[32] in one session, sf1 first (warm JVM favors sf10)."
    )
    print(json.dumps(out))
    rounds = [
        int(m.group(1))
        for f in os.listdir(ROOT)
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    n = (max(rounds) + 1) if rounds else 0
    path = os.path.join(ROOT, f"CHECK_sf10_r{n:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"written: {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
