#!/usr/bin/env python
"""Generate an sf1 scaling dataset (10x sf0.1) for the one-off
superlinearity check (r5 verdict #2).

/root/testdata is read-only and has no sf1, so this derives one from
sf0.1 by 10-way replication with DISJOINT key/content spaces per copy:

* fact/dim keys are offset per copy so joins stay valid and keys stay
  unique (custkey, orderkey, partkey, suppkey, doc_id, vec_id,
  event_id, user_id);
* document TEXT is copy-tagged per token (every word gets a _cN
  suffix), making the gram/prefix/minhash spaces of different copies
  disjoint — near-dup structure (pairs, postings, bands) scales
  exactly 10x instead of exploding combinatorially across copies,
  which is what "10x more data" means for a dedup workload;
* embeddings get small deterministic per-copy perturbations so vector
  near-dup structure also replicates instead of collapsing onto
  cos=1.0 cross-copy pairs.

Output: /root/repo/.scale/sf1/*.parquet (gitignored). Usage:
    python scripts/make_sf1.py
"""
from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chillastic_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1")
COPIES = 10

OFFSETS = {
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 100_000,
    },
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}


def main() -> None:
    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    for t in ("region", "nation"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
        print(f"copied {t}")
    for t, offs in OFFSETS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            c = base
            for col, step in offs.items():
                # a silently-skipped offset column duplicates keys
                # across all 10 copies — joins fan out 10x and every
                # scaling ratio is measured on structurally wrong data
                if col not in c.columns:
                    raise SystemExit(
                        f"make_sf1: expected key column {col!r} missing "
                        f"from {t} — offsets cannot be applied"
                    )
                c = c.withColumn(col, F.col(col) + F.lit(i * step))
            if t == "documents" and i > 0:
                # disjoint token space per copy (see module docstring)
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1_c{i}")
                )
            if t == "embeddings" and i > 0:
                # DECORRELATE copies with a copy-specific ORTHOGONAL
                # map (circular dim shift by i + per-dim sign flips):
                # within-copy inner products are preserved EXACTLY (the
                # planted near-dup structure replicates 10x), while
                # cross-copy cosines drop to noise. The old 0.01 dither
                # left cross-copy cosine ~0.998 (measured), handing
                # every vector C(10,2)=45 near-identical cross-copy
                # pairs — a ~55x pair blowup instead of 10x replicated
                # structure.
                # Cast BACK to float: arithmetic on <double> widens to
                # array<double>, silently doubling the table's bytes vs
                # sf0.1 and breaking the 10x-data claim.
                emb = F.col("embedding")
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        emb,
                        lambda x, j: (
                            F.element_at(
                                emb,
                                F.pmod(j + F.lit(i * 29), F.size(emb)) + 1,
                            )
                            # murmur-hashed per-(dim, copy) sign: a
                            # j-linear parity flip left adjacent copies
                            # at cos ~0.37 (structured, not random)
                            * F.when(
                                F.pmod(F.hash(j, F.lit(i)), 2) == 0,
                                F.lit(1.0),
                            ).otherwise(F.lit(-1.0))
                        ).cast("float"),
                    ),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(f"{DST}/{t}_dir")
        # single-file layout to match the sf dirs' <table>.parquet contract;
        # remove ANY stale target first (file OR directory) so re-runs
        # never nest a new part file inside a leftover directory
        import glob

        target = f"{DST}/{t}.parquet"
        if os.path.isdir(target):
            shutil.rmtree(target)
        elif os.path.exists(target):
            os.remove(target)
        files = glob.glob(f"{DST}/{t}_dir/part-*.parquet")
        if len(files) == 1:
            shutil.move(files[0], target)
            shutil.rmtree(f"{DST}/{t}_dir")
        else:
            # multi-file: keep the directory — Spark reads it natively;
            # scripts/check.py globs '<dir>.parquet/*.parquet' for DuckDB
            os.rename(f"{DST}/{t}_dir", target)
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
