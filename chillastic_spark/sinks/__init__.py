"""Idempotent upsert sink (SURVEY §2.1 S4/S5).

The reference achieves effectively-once delivery with at-least-once
scroll + ``doc_as_upsert`` bulk updates (transfer.js:175-189). The
Spark-native equivalent is a MERGE on ``(_index,_type,_id)``: new rows
replace existing rows with the same key, unseen keys append.

On parquet (this repo's storage) the merge is implemented as
``existing ⟕anti new ∪ new`` with an atomic directory swap per index —
one shuffle on the key, correct under re-runs. On a real deployment the
same call maps 1:1 to Delta/Iceberg ``MERGE INTO`` (transactional,
partition-pruned), which is the 100 TB path; the swap here exists only
because plain parquet has no transaction log.
"""
from __future__ import annotations

import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chillastic_spark.sources import ENVELOPE_SCHEMA, DocumentStore

KEY = ["_index", "_type", "_id"]

# The parquet store has no transaction log, so one-writer-per-index is
# enforced here: concurrent read-merge-swap on the same index dir
# (Engine.run_task parallelism>1, or two REST /_run calls in the same
# process) would lose one writer's rows or crash mid-os.rename. Delta/
# Iceberg MERGE replaces this with real transactions at scale.
_INDEX_LOCKS: dict[str, threading.Lock] = {}
_INDEX_LOCKS_GUARD = threading.Lock()


def _index_lock(path: str) -> threading.Lock:
    with _INDEX_LOCKS_GUARD:
        return _INDEX_LOCKS.setdefault(os.path.abspath(path), threading.Lock())


def _normalise(df: DataFrame) -> DataFrame:
    cols = []
    for f_ in ENVELOPE_SCHEMA.fields:
        if f_.name in df.columns:
            cols.append(F.col(f_.name).cast(f_.dataType))
        else:
            cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
    return df.select(*cols)


def upsert(spark: SparkSession, store: DocumentStore, df: DataFrame) -> int:
    """MERGE ``df`` into ``store`` keyed on (_index,_type,_id).

    Within-batch duplicates keep the last occurrence (bulk-update
    semantics: later ops win). Returns rows delivered.
    """
    df = _normalise(df)
    # Within-batch conflicts on the same key keep ONE row chosen by a
    # DETERMINISTIC tie-break (payload hash). "Arrival order" is not
    # meaningful after a distributed mutate (and would vary with
    # partitioning); a stable winner keeps re-runs byte-identical.
    w_rank = F.row_number().over(
        Window.partitionBy(*KEY).orderBy(F.desc(F.md5(F.col("_source"))), F.desc("_size"))
    )
    df = df.withColumn("__rk", w_rank).filter(F.col("__rk") == 1).drop("__rk")
    df = df.cache()
    try:
        delivered = 0
        indices = [r["_index"] for r in df.select("_index").distinct().collect()]
        for index in indices:
            batch = df.filter(F.col("_index") == index)
            delivered += batch.count()  # rows delivered = batch size
            with _index_lock(store.index_path(index)):
                existing = store.read(spark, index)
                merged = _normalise(
                    existing.join(batch, KEY, "left_anti").unionByName(batch)
                )
                _atomic_replace(spark, store, index, merged)
        return delivered
    finally:
        df.unpersist()


def _atomic_replace(
    spark: SparkSession, store: DocumentStore, index: str, merged: DataFrame
) -> None:
    target = store.index_path(index)
    tmp = target + ".tmp-" + uuid.uuid4().hex[:8]
    merged.write.mode("overwrite").parquet(tmp)
    old = target + ".old-" + uuid.uuid4().hex[:8]
    if os.path.exists(target):
        os.rename(target, old)
    os.rename(tmp, target)
    if os.path.exists(old):
        shutil.rmtree(old)


def purge(
    spark: SparkSession,
    store: DocumentStore,
    index: str,
    ids: DataFrame | list[str],
    type: "str | None" = None,
) -> int:
    """Targeted delete by document id (right-to-be-forgotten): rewrite
    the index WITHOUT the given ``_id``s and atomically swap.

    ``ids`` may be a list (small, driver-side) or a DataFrame with an
    ``_id`` column (billions of ids: the anti-join broadcasts or
    shuffles as Catalyst sees fit). Returns rows removed. The reverse
    of upsert's effectively-once delivery — re-running a purge is a
    no-op, so it composes with checkpointed task resume.
    """
    if isinstance(ids, list):
        id_df = spark.createDataFrame([(i,) for i in ids], "_id string")
    else:
        id_df = ids.select(F.col("_id").cast("string"))
    victims = id_df.distinct()
    with _index_lock(store.index_path(index)):
        existing = store.read(spark, index)
        if type is not None:
            match = existing.filter(F.col("_type") == type).join(victims, "_id", "semi")
            kept = existing.join(
                match.select("_type", "_id"), ["_type", "_id"], "left_anti"
            )
            removed = match.count()
        else:
            kept = existing.join(victims, "_id", "left_anti")
            removed = existing.count() - kept.count()
        if removed == 0:
            return 0
        _atomic_replace(spark, store, index, _normalise(kept))
    return removed
