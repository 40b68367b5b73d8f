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
]


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
    }
    path = os.path.join(ROOT, f"CHECK_sf1_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {path}: {len(results)} queries, {len(failures)} failures, "
          f"{len(missing)} missing")
    return 1 if (failures or missing) else 0


if __name__ == "__main__":
    sys.exit(main())
