#!/usr/bin/env python
"""sf1 oracle-correctness run (r6 verdict #3, refreshed whenever the
scale-sensitive surface changes): drives scripts/check.py over the 21
bench headliners + the scale-sensitive families at the 10x dataset
(scripts/make_sf1.py output) and persists the per-query verdicts as
CHECK_sf1_r{N}.json — the committed evidence artifact.

Usage: python scripts/check_sf1.py [round_number]
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, ".scale", "sf1")

# the committed scope: bench headliners + deciles/percentiles/sketch
# twins/every dedup-pair family (queries whose cost or thresholds are
# scale-sensitive). Keep in lockstep with the r6-verdict #3 scope.
SCOPE = [
    "bm25_topk", "hybrid_search_rrf", "events_hourly",
    "dedup_substring_spans", "dedup_winnow_pairs", "simhash_pairs",
    "dsir_importance_weights", "dedup_keep_best", "dedup_incremental",
    "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue",
    "q10_returned_items", "q11_important_parts", "q18_large_orders",
    "embedding_dup_pairs", "dedup_clusters", "dedup_containment_prefix",
    "dedup_ngram_jaccard", "dedup_ngram_containment",
    "dedup_minhash_lsh", "dedup_simhash", "heavy_hitter_terms",
    "tfidf_top_terms", "sketch_distinct_users", "sketch_value_quantiles",
    "source_unigram_kl", "value_percentiles", "sessionize",
    "purchase_prior_window", "balance_deciles", "balance_deciles_approx",
    "text_features", "events_gapfill", "similarity_topk",
    "dedup_edit_distance", "dedup_exact",
    # r7 additions: the vector family whose pairwise paths moved to the
    # block-pair matmul grid — scale-sensitive by construction
    "knn_graph_edges", "semantic_decontaminate_flags",
    "semantic_dedup_manifest", "embedding_outliers",
    # r8 additions (r7 verdict #3): the ANN serving trio — recall
    # floors were pinned at sf0.01 only — plus the new LSH-bucketed
    # unblocked dedup (recall twin)
    "ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk",
    "embedding_dup_pairs_unblocked",
    # late-r8 additions (both sf1-gated individually this round:
    # ivf-pq twin recall 0.74, incremental hash-PASS 14,691 rows/3.9s)
    "ann_ivf_pq_topk", "embedding_dup_incremental",
    "dedup_jaccard_capped",
]


def check_indexes() -> dict:
    """Materialized-index equivalence at sf1 (r7 verdict #3): the
    vector index must serve BIT-IDENTICAL results to the scan-time LSH
    operator — after build, after an incremental add, and after
    compaction — with the probe scan pruned to bucket partitions
    (PartitionFilters); the inverted index must serve the identical
    BM25 top-k with the term filter pushed to the postings scan."""
    import tempfile
    import time

    import pyspark.sql.functions as F

    sys.path.insert(0, ROOT)
    from chillastic_spark.operators.similarity import lsh_topk
    from chillastic_spark.queries.search import TERMS, bm25_topk
    from chillastic_spark.session import get_spark
    from chillastic_spark.sources.search_index import (
        bm25_search_index,
        build_inverted_index,
    )
    from chillastic_spark.sources.vector_index import (
        ann_query_index,
        build_vector_index,
        compact_vector_index,
        update_vector_index,
    )
    from chillastic_spark.tables import load

    spark = get_spark("check-sf1-indexes")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    planes = 5

    e = load(spark, SF1, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with tempfile.TemporaryDirectory(prefix="sf1_vidx_") as idx:
        t0 = time.time()
        old = e.filter(F.col("vec_id") >= 10)
        build_vector_index(old, idx, planes=planes)
        build_sec = time.time() - t0
        t0 = time.time()
        meta = update_vector_index(e.filter(F.col("vec_id") < 10), idx)
        update_sec = time.time() - t0

        def serve(probes):
            df = ann_query_index(spark, idx, q, k=10, probes=probes)
            plan = df._jdf.queryExecution().executedPlan().toString()
            return (
                {(r[0], r[1], r[2]) for r in df.collect()},
                "PartitionFilters" in plan and "bucket" in plan,
            )

        def scan(probes):
            return {
                (r[0], r[1], r[2])
                for r in lsh_topk(
                    e, q, k=10, planes=planes, probes=probes
                ).collect()
            }

        t0 = time.time()
        eq, pruned, n = [], [], 0
        for probes in (1, 3):
            got, pr = serve(probes)
            want = scan(probes)
            eq.append(got == want and len(want) > 0)
            pruned.append(pr)
            n = max(n, len(want))
        query_sec = time.time() - t0
        t0 = time.time()
        compact_vector_index(spark, idx)
        compact_sec = time.time() - t0
        got_after, pr_after = serve(3)
        eq.append(got_after == scan(3))
        out["vector_index"] = {
            "n_vectors": meta["n_vectors"],
            "serving_equals_scan": all(eq),
            "partition_pruned": all(pruned) and pr_after,
            "build_sec": round(build_sec, 1),
            "incremental_add_sec": round(update_sec, 1),
            "query_pair_sec": round(query_sec, 1),
            "compact_sec": round(compact_sec, 1),
            "topk_rows": n,
        }

    d = load(spark, SF1, "documents")
    with tempfile.TemporaryDirectory(prefix="sf1_sidx_") as idx:
        t0 = time.time()
        stats = build_inverted_index(spark, d, idx)
        build_sec = time.time() - t0
        t0 = time.time()
        df = bm25_search_index(spark, idx, TERMS, k=20)
        got = [tuple(r) for r in df.collect()]
        want = [tuple(r) for r in bm25_topk(spark, SF1).collect()]
        query_sec = time.time() - t0
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out["search_index"] = {
            "n_docs": stats["n_docs"],
            "serving_equals_scan": got == want and len(want) > 0,
            "term_filter_pushed": "PushedFilters: [In(term" in plan,
            "never_touches_corpus": "documents.parquet" not in plan,
            "build_sec": round(build_sec, 1),
            "query_sec": round(query_sec, 1),
        }
    return out


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "07"
    if not os.path.isdir(SF1):
        print(f"{SF1} missing — run scripts/make_sf1.py first")
        return 2
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "check.py"), SF1, *SCOPE],
        capture_output=True, text=True, timeout=7200,
    )
    out = proc.stdout + proc.stderr
    results: dict[str, dict] = {}
    failures: list[str] = []
    calib: list[float] = []
    for line in out.splitlines():
        m = re.match(
            r"(PASS|TWIN-PASS)\s+(\S+) \((\d+) rows, ([\d.]+)s\)", line.strip()
        )
        if m:
            results[m.group(2)] = {
                "result": "PASS",
                "rows": int(m.group(3)),
                "spark_sec": float(m.group(4)),
            }
            continue
        m = re.match(r"FAIL\s+(\S+?):", line.strip())
        if m:
            name = m.group(1)
            failures.append(name)
            results[name] = {"result": "FAIL", "detail": line.strip()}
            continue
        m = re.match(r"calibration_sec: ([\d.]+)", line.strip())
        if m:
            calib.append(float(m.group(1)))
    missing = [q for q in SCOPE if q not in results]
    indexes = check_indexes()
    index_fail = [
        f"indexes.{k}"
        for k, v in indexes.items()
        if not (v.get("serving_equals_scan") and
                v.get("partition_pruned", v.get("term_filter_pushed")))
    ]
    failures += index_fail
    doc = {
        "sf_dir": SF1,
        "scope": (
            "r6 verdict #3 (refreshed): the 21 bench headliners + the "
            "scale-sensitive families (deciles, percentiles, sketch twins, "
            "every dedup pair family, q11's scale-free threshold) "
            "oracle-checked at 10x data (6M-row lineitem, 600k docs) "
            "against DuckDB / local twins"
        ),
        "n_queries": len(results),
        "failures": failures + missing,
        "calibration_sec": calib,
        "results": results,
        # r8: materialized-index equivalence at sf1 (ANN serving +
        # inverted index), with the partition/term pushdown assertions
        "indexes": indexes,
    }
    path = os.path.join(ROOT, f"CHECK_sf1_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {path}: {len(results)} queries, {len(failures)} failures, "
          f"{len(missing)} missing")
    return 1 if (failures or missing) else 0


if __name__ == "__main__":
    sys.exit(main())
