#!/usr/bin/env python
"""Generate the ADVERSARIALLY SKEWED sf1 variant (r7 verdict #4).

scripts/make_sf1.py scales benignly — every copy gets a disjoint
gram/key space, so hot keys never form. Real scraped corpora are the
opposite: boilerplate shingles shared by a third of the corpus, one
template page near-duplicated across 10% of documents, one dominant
class label, one bot user. This script derives that corpus from the
benign sf1 so the pair generators' skew behavior (hot-gram cap, AQE
skew handling, block-grid occupancy, single-partition windows) can be
measured rather than argued:

* documents: a fixed three-token phrase is APPENDED to 30% of docs
  (deterministic doc_id gate) — its shingles land in ~30% of the
  corpus, the worst hot-gram bucket the inverted-index join can see;
  and 10% of docs (disjoint gate) have their text REPLACED by one
  shared template plus a per-doc unique token — a genuine near-dup
  cluster whose pair count is quadratic in the cluster, the honest
  output-size stressor.
* embeddings: 50% of vectors get label 'hotskew' — the block-pair
  grid's largest possible group (10k vectors → 5 blocks → 15 grid
  tasks at block_size 2048). r9 adds a DISJOINT 30% slice whose
  vectors are direction-concentrated (one shared base direction plus
  tiny deterministic per-vector noise): every hyperplane projects
  them to the same side, so they pile into ONE LSH bucket — the hot
  bucket knn_graph / the unblocked dedup's bucket grid must bound
  (r8 verdict #5). Labels of that slice are untouched, so the
  hot-LABEL group measured since r8 is unchanged.
* events: 30% of events are reassigned to user_id 1 — one bot user,
  the single-partition window stressor for sessionize.
* every other table copies through unchanged.

Output: /root/repo/.scale/skew/*.parquet (gitignored; ~same bytes as
sf1). Usage: python scripts/make_skew.py
"""
from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chillastic_spark.session import get_spark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, ".scale", "sf1")
DST = os.path.join(ROOT, ".scale", "skew")

HOT_PHRASE = "skewhot boiler plate"  # 3 tokens → 1 hot interior 3-gram
CLUSTER_TEXT = (
    "template page header navigation footer copyright all rights "
    "reserved contact about privacy terms sitemap search login"
)
HOT_FRAC = 0.30      # docs carrying the hot phrase
CLUSTER_FRAC = 0.10  # docs collapsed onto the template (disjoint gate)
HOT_LABEL_FRAC = 0.50
HOT_USER_FRAC = 0.30
# r9: vec_id % 100 in [50, 80) — disjoint from the hot-label gate
# (< 50) — gets one shared direction + tiny per-(id, position) noise
HOT_BUCKET_FRAC = 0.30


def _write_single(df, table: str) -> None:
    tmp = f"{DST}/{table}_dir"
    df.repartition(32).write.mode("overwrite").parquet(tmp)
    target = f"{DST}/{table}.parquet"
    if os.path.isdir(target):
        shutil.rmtree(target)
    elif os.path.exists(target):
        os.remove(target)
    files = glob.glob(f"{tmp}/part-*.parquet")
    if len(files) == 1:
        shutil.move(files[0], target)
        shutil.rmtree(tmp)
    else:
        os.rename(tmp, target)


def main() -> None:
    if not os.path.isdir(SRC):
        raise SystemExit("benign sf1 missing — run scripts/make_sf1.py first")
    spark = get_spark("make-skew")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem",
    ):
        src = f"{SRC}/{t}.parquet"
        dst = f"{DST}/{t}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
        print(f"copied {t}")

    d = spark.read.parquet(f"{SRC}/documents.parquet")
    # deterministic, DISJOINT gates on doc_id: % 100 < 10 → cluster,
    # 10..39 → hot phrase, rest untouched
    gate = F.pmod(F.col("doc_id"), F.lit(100))
    d = d.withColumn(
        "text",
        F.when(
            gate < int(CLUSTER_FRAC * 100),
            F.concat(
                F.lit(CLUSTER_TEXT + " uniq"),
                F.col("doc_id").cast("string"),
            ),
        )
        .when(
            gate < int((CLUSTER_FRAC + HOT_FRAC) * 100),
            F.concat(F.col("text"), F.lit(" " + HOT_PHRASE)),
        )
        .otherwise(F.col("text")),
    )
    _write_single(d, "documents")
    print("documents: skewed (30% hot phrase, 10% template cluster)")

    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    # label is integral in the synthetic schema: the hot label is a
    # sentinel far outside the existing range, cast to the column type
    e = e.withColumn(
        "label",
        F.when(
            F.pmod(F.col("vec_id"), F.lit(100)) < int(HOT_LABEL_FRAC * 100),
            F.lit(999_999).cast(e.schema["label"].dataType),
        ).otherwise(F.col("label")),
    )
    # r9 hot LSH bucket: ids 50..79 (mod 100) collapse onto one base
    # direction — every component positive and near 1.0, so every
    # hyperplane projection lands the same side and the whole slice
    # shares one bucket at any plane count. Per-(id, position) noise
    # (deterministic long arithmetic) keeps the vectors distinct.
    # NB the two-parameter higher-order lambda receives
    # (element, array_index) — here that index IS what we want.
    vgate = F.pmod(F.col("vec_id"), F.lit(100))
    elem_t = e.schema["embedding"].dataType.elementType.simpleString()
    e = e.withColumn(
        "embedding",
        F.when(
            (vgate >= int(HOT_LABEL_FRAC * 100))
            & (vgate < int((HOT_LABEL_FRAC + HOT_BUCKET_FRAC) * 100)),
            F.transform(
                F.col("embedding"),
                lambda x, i: (
                    F.lit(1.0)
                    + F.pmod(F.col("vec_id") * 31 + i * 17, F.lit(97))
                    / F.lit(970.0)
                ).cast(elem_t),
            ),
        ).otherwise(F.col("embedding")),
    )
    _write_single(e, "embeddings")
    print(
        "embeddings: skewed (50% one label; 30% direction-concentrated"
        " → one LSH bucket)"
    )

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    ev = ev.withColumn(
        "user_id",
        F.when(
            F.pmod(F.col("event_id"), F.lit(100)) < int(HOT_USER_FRAC * 100),
            F.lit(1).cast(ev.schema["user_id"].dataType),
        ).otherwise(F.col("user_id")),
    )
    _write_single(ev, "events")
    print("events: skewed (30% one user)")

    for t in ("documents", "embeddings", "events"):
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
