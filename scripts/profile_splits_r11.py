#!/usr/bin/env python
"""Stage breakdown for the splits family (r11 verdict item 3): where
do leakage_safe_splits / shard_manifest / splits_incremental actually
spend their time — pair generation, connected components, or the final
joins? Also reports the CC edge-table size (the small-graph fast-path
design input). Warm measurements: one throwaway pass, then N timed
reps per stage, medians reported.

Usage: python scripts/profile_splits_r11.py [reps]
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
from chillastic_spark.tables import load

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn, reps=REPS):
    out = []
    for _ in range(reps):
        with batch_scope():
            t = time.time()
            fn()
            out.append(round(time.time() - t, 3))
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from chillastic_spark.operators import dedup as D
    from chillastic_spark.operators import text as T
    from chillastic_spark.operators.assembly import rep_of
    from chillastic_spark.operators.components import connected_components
    from chillastic_spark.queries import all_queries

    spark = get_spark("profile-splits-r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    d = load(spark, SF, "documents")

    stages = {
        # pair generation alone (the shared prefix of all three)
        "pairs_only": lambda: noop(
            D.ngram_jaccard_pairs(d, n=3, threshold=0.5)
        ),
        # pair gen + CC (rep_of without the final select)
        "pairs_plus_cc": lambda: noop(
            rep_of(d.select("doc_id", "source"),
                   D.ngram_jaccard_pairs(d, n=3, threshold=0.5))
        ),
        # the full queries
        "leakage_safe_splits": lambda: noop(
            qs["leakage_safe_splits"].fn(spark, SF)
        ),
        "shard_manifest": lambda: noop(qs["shard_manifest"].fn(spark, SF)),
        "splits_incremental": lambda: noop(
            qs["splits_incremental"].fn(spark, SF)
        ),
        # splits_incremental's two sub-trees
        "inc_pairs_cc_existing": lambda: noop(
            rep_of(
                d.filter(F.col("doc_id") % 3 != 0).select("doc_id", "source"),
                D.ngram_jaccard_pairs(
                    d.filter(F.col("doc_id") % 3 != 0), n=3, threshold=0.5
                ),
            )
        ),
        "inc_minhash_flags": lambda: noop(
            D.minhash_lsh_incremental(d, F.col("doc_id") % 3 == 0).select(
                "doc_id", "match_id"
            )
        ),
        # token-count join arm of shard_manifest
        "token_counts": lambda: noop(
            d.select("doc_id", T.token_count("text").alias("n_tokens"))
        ),
    }

    # warmup pass (JIT/codegen/python workers)
    for name, fn in stages.items():
        spark.sparkContext.setJobDescription(f"warmup {name}")
        with batch_scope():
            fn()

    results = {}
    for name, fn in stages.items():
        spark.sparkContext.setJobDescription(f"timed {name}")
        ts = timed(fn)
        results[name] = {"median": statistics.median(ts), "samples": ts}
        print(f"# {name}: {ts}", file=sys.stderr)

    # CC edge-table size at this SF (fast-path design input)
    with batch_scope():
        pairs = D.ngram_jaccard_pairs(d, n=3, threshold=0.5)
        n_edges = pairs.count()
    with batch_scope():
        e = load(spark, SF, "embeddings")
        emb_pairs = D.embedding_dup_pairs(e, threshold=0.3)
        n_emb_edges = emb_pairs.count()
    results["_edge_counts"] = {
        "jaccard_pairs_t0.5": n_edges,
        "embedding_pairs_t0.3": n_emb_edges,
    }
    print(json.dumps({"sf_dir": SF, "reps": REPS, "stages": results}))


if __name__ == "__main__":
    main()
