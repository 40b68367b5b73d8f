#!/usr/bin/env python
"""Derive an sf10 DOCUMENTS + EMBEDDINGS corpus (10x .scale/sf1 =
100x the driver's sf0.1) for the spot-scale of the steepest sf1
scalers (r9 verdict #6: dedup_incremental 4.66x at the last decade,
dedup_simhash 23s at sf1 — one more decade confirms the exponent
before a user finds it).

Same replication discipline as make_sf1 (its docstring carries the
rationale), applied to the two tables those queries touch:

* doc_id/vec_id offset by 10_000_000 per copy — key spaces disjoint;
* document TEXT token-tagged per copy (`_dN` suffix — distinct from
  sf1's `_cN`, so sf10 grams are disjoint across BOTH replication
  levels): near-dup structure scales exactly 10x, no cross-copy
  combinatorics;
* embeddings decorrelated per copy with an orthogonal map (circular
  shift by 31*i + murmur-hashed sign flips, float-preserving) — the
  make_sf1 recipe with a different shift constant so sf10 copies
  decorrelate from each other AND from sf1's own copies.

Output: /root/repo/.scale/sf10/{documents,embeddings}.parquet
(gitignored). Usage: python scripts/make_sf10.py
"""
from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chillastic_spark.session import get_spark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, ".scale", "sf1")
DST = os.path.join(ROOT, ".scale", "sf10")
COPIES = 10
OFFSETS = {"documents": {"doc_id": 10_000_000}, "embeddings": {"vec_id": 10_000_000}}


def main() -> int:
    if not os.path.isdir(SRC):
        raise SystemExit("sf1 missing — run scripts/make_sf1.py first")
    spark = get_spark("make-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    for t, offs in OFFSETS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            c = base
            for col, step in offs.items():
                if col not in c.columns:
                    raise SystemExit(f"make_sf10: key column {col!r} missing from {t}")
                c = c.withColumn(col, F.col(col) + F.lit(i * step))
            if t == "documents" and i > 0:
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1_d{i}")
                )
            if t == "embeddings" and i > 0:
                emb = F.col("embedding")
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        emb,
                        lambda x, j: (
                            F.element_at(
                                emb,
                                F.pmod(j + F.lit(i * 31), F.size(emb)) + 1,
                            )
                            * F.when(
                                F.pmod(F.hash(j, F.lit(1000 + i)), 2) == 0,
                                F.lit(1.0),
                            ).otherwise(F.lit(-1.0))
                        ).cast("float"),
                    ),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        target = f"{DST}/{t}.parquet"
        if os.path.isdir(target):
            shutil.rmtree(target)
        elif os.path.exists(target):
            os.remove(target)
        out.repartition(64).write.mode("overwrite").parquet(target)
        n = spark.read.parquet(target).count()
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
