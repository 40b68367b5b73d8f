#!/usr/bin/env python
"""Calibrate the unblocked embedding dedup's LSH table count (r10
verdict item 6): the registered config (planes=3, probes=2, tables=8)
measures recall 0.983/0.989 against a 0.9 floor — headroom paid for in
candidate volume. Measure recall AND warm runtime for tables ∈
{5,6,7,8} at every committed SF against the numpy all-pairs truth, so
the registered count can drop to the smallest value holding the floor
WITH margin on every corpus.

Usage: python scripts/sweep_unblocked_r11.py [reps]
Writes one JSON line; evidence lands in OPTIMIZATION_r11.md.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from chillastic_spark.persist import batch_scope
from chillastic_spark.session import get_spark

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
TABLES = [8, 7, 6, 5]
THRESHOLD, PLANES, PROBES = 0.4, 3, 2


def _round_det(x, d):
    return np.floor(x * (10.0 ** d) + 0.5) / (10.0 ** d)


def _truth(sf_dir: str) -> dict:
    import duckdb

    con = duckdb.connect()
    e = con.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    V = np.array(e["embedding"].tolist(), dtype=np.float64)
    ids = e["vec_id"].to_numpy()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = _round_det(Vn @ Vn.T, 4)
    iu = np.triu_indices(len(V), 1)
    return {
        (int(ids[i]), int(ids[j])): float(C[i, j])
        for i, j in zip(*iu)
        if C[i, j] >= THRESHOLD
    }


def main() -> None:
    from chillastic_spark.operators import dedup as D
    from chillastic_spark.tables import load

    spark = get_spark("sweep-unblocked-r11")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for sf_dir in SFS:
        truth = _truth(sf_dir)
        e = load(spark, sf_dir, "embeddings")
        per_t: dict = {}
        # warmup at each table count once, then interleave timed reps
        for t in TABLES:
            with batch_scope():
                D.embedding_dup_pairs_unblocked(
                    e, threshold=THRESHOLD, planes=PLANES,
                    probes=PROBES, tables=t,
                ).write.format("noop").mode("overwrite").save()
        times: dict = {t: [] for t in TABLES}
        recalls: dict = {}
        for rep in range(REPS):
            for t in TABLES:
                spark.sparkContext.setJobDescription(
                    f"unblocked sf={sf_dir} tables={t} rep={rep}"
                )
                with batch_scope():
                    t0 = time.time()
                    df = D.embedding_dup_pairs_unblocked(
                        e, threshold=THRESHOLD, planes=PLANES,
                        probes=PROBES, tables=t,
                    )
                    df.write.format("noop").mode("overwrite").save()
                    times[t].append(round(time.time() - t0, 3))
                    if rep == 0:
                        got = {
                            (int(r["id_a"]), int(r["id_b"])): float(r["cos"])
                            for r in df.collect()
                        }
                        fp = [k for k in got if k not in truth]
                        assert not fp, f"false positives at tables={t}: {fp[:3]}"
                        recalls[t] = round(len(got) / len(truth), 4)
        for t in TABLES:
            per_t[t] = {
                "recall": recalls[t],
                "median_sec": statistics.median(times[t]),
                "samples": times[t],
            }
            print(f"# {sf_dir} tables={t}: {per_t[t]}", file=sys.stderr)
        out[sf_dir] = {"n_truth_pairs": len(truth), "tables": per_t}
    print(json.dumps({"threshold": THRESHOLD, "planes": PLANES,
                      "probes": PROBES, "reps": REPS, "corpora": out}))


if __name__ == "__main__":
    main()
