#!/usr/bin/env python
"""Scale stress: run the full curation pipeline on a synthetic 100k-doc
corpus (~8M tokens) with planted exact (2%) and near (4%) duplicates
(ids = 1 mod 100 hit the exact-dup branch first: 1/20 - 1/100 = 4%).

Corpus is generated DISTRIBUTED (JVM-side hash text, no driver loop) —
the generator itself is the pattern for testing at any scale. Round-1
result on local[32]: 44s wall, dup pruning exactly matching the plant
(100000 → 98000 exact → ~94000 near → 188k chunks).

Usage: python scripts/stress_curation.py [n_docs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chillastic_spark.pipelines import CurationConfig, curate
from chillastic_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("stress-curation")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    vocab = [f"word{i}" for i in range(40)]

    def mk_text(seed_col):
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(79)),
            lambda i: F.element_at(
                F.array(*[F.lit(w) for w in vocab]),
                ((F.xxhash64(seed_col, i) % 40 + 40) % 40 + 1).cast("int"),
            ),
        )
        return F.concat_ws(" ", toks)

    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    base = base.withColumn(
        "lang",
        F.when(F.col("doc_id") % 3 == 0, F.lit("en")).otherwise(F.lit("de")),
    ).withColumn("source", F.concat(F.lit("src"), (F.col("doc_id") % 8).cast("string")))
    docs = base.withColumn(
        "text",
        F.when(F.col("doc_id") % 50 == 1, mk_text(F.col("doc_id") - 1))
        .when(
            F.col("doc_id") % 20 == 1,
            F.concat(mk_text(F.col("doc_id") - 1), F.lit(" extra token")),
        )
        .otherwise(mk_text(F.col("doc_id"))),
    ).localCheckpoint()
    print(f"corpus: {docs.count()} docs")

    t0 = time.time()
    chunks, report = curate(
        docs,
        CurationConfig(
            min_quality=0.2,
            min_tokens=8,
            near_dup_threshold=0.5,
            dsir_keep_frac=0.6,
            mixture_budget=4_000_000,
        ),
        dsir_target=F.col("lang") == "en",
        mixture={f"src{i}": (i % 4) + 1 for i in range(8)},
    )
    print("report:", report.as_dict())
    print(f"curation wall: {time.time() - t0:.1f}s")

    # assembly stage: leakage-safe splits + sharded write of the
    # surviving docs (pairs recomputed here — in a real run curate
    # would hand its pair list through)
    import tempfile

    from chillastic_spark.pipelines import assemble

    t1 = time.time()
    survivors = docs.join(
        chunks.select("doc_id").distinct(), "doc_id", "left_semi"
    )
    manifest, summary = assemble(survivors, n_shards=16)
    out = tempfile.mkdtemp(prefix="stress_shards_")
    from chillastic_spark.operators.assembly import write_sharded

    write_sharded(manifest, out, n_shards=16)
    split_counts = {
        r["split"]: r["n"]
        for r in manifest.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    print("splits:", split_counts, "shard rows:", summary.count())
    print(f"assembly wall: {time.time() - t1:.1f}s  (tree at {out})")

    # phase 3: continuous ingest through the COMPOSED curation stream
    # (drift -> frozen-LM filter -> near-dedup -> leakage-safe assembly
    # per micro-batch): n_docs/10 incoming docs in 5 files, 20% planted
    # near-dups of the published corpus — measures the kappa path's
    # per-batch wall and verifies adoption volume at scale
    from chillastic_spark.streaming import curation_stream

    t2 = time.time()
    n_inc = max(1000, n_docs // 10)
    stream_root = tempfile.mkdtemp(prefix="stress_stream_")
    inc_dir = os.path.join(stream_root, "incoming")
    os.makedirs(inc_dir)
    static = survivors.select("doc_id", "text", "source").localCheckpoint()
    pub_manifest = manifest.select("doc_id", "rep_id", "split").localCheckpoint()
    inc = (
        spark.range(n_docs, n_docs + n_inc)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "source", F.concat(F.lit("inc"), (F.col("doc_id") % 4).cast("string"))
        )
        .withColumn(
            # planted near-dups must seed off static docs whose text IS
            # mk_text(seed): the corpus generator overrides doc_id%50==1
            # (exact dup) and %20==1 (near dup), so pin seed ≡ 2 (mod
            # 20) — never an overridden id
            "__seed",
            (F.col("doc_id") % max(n_docs // 20, 1)) * 20 + 2,
        )
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 1,  # near-dup of a static doc
                F.concat(mk_text(F.col("__seed")), F.lit(" tail")),
            ).otherwise(mk_text(F.col("doc_id"))),
        )
        .select("doc_id", "text", "source")
    )
    n_files = 5
    for i in range(n_files):
        inc.filter(F.col("doc_id") % n_files == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(inc_dir, f"file={i}"))
    # file-source streams read leaf files; point at the nested parquet
    out_root = os.path.join(stream_root, "cur")
    q = curation_stream(
        spark,
        inc_dir + "/*",
        static,
        pub_manifest,
        out_root,
        os.path.join(stream_root, "ckpt"),
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(600), "curation stream timed out"
    m_inc = spark.read.parquet(out_root + "/manifest")
    n_assigned = m_inc.count()
    adopted = m_inc.join(
        pub_manifest.select(F.col("rep_id").alias("__pub_rep")).distinct(),
        m_inc["rep_id"] == F.col("__pub_rep"),
        "left_semi",
    ).count()
    wall = time.time() - t2
    print(
        f"stream: {n_assigned} docs assigned ({adopted} adopted published "
        f"reps) in {n_files} micro-batches"
    )
    print(f"stream wall: {wall:.1f}s ({n_inc / wall:.0f} docs/s incl. model freeze)")


if __name__ == "__main__":
    main()
