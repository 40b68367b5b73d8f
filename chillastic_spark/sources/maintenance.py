"""Table maintenance: small-file stats + compaction (OPTIMIZE).

A long-running upsert/reindex pipeline (the reference's continuous
re-enqueue model, worker.js:61-123) accretes small parquet files —
every micro-batch commit adds a few. At 100 TB the file count, not the
byte count, becomes the scan bottleneck: each file costs a footer read,
a task, and a scheduler round-trip. Periodic compaction to
~128 MB files keeps scans planable (one task per ~1 row-group) and is
what Delta/Iceberg OPTIMIZE does; on plain parquet we implement it as
repartition-to-size + atomic directory swap.

Compaction preserves a Hive ``_type=...`` layout so the partition
pruning the store's per-type reads rely on (SURVEY P4) survives.
"""
from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

from chillastic_spark.sources import ENVELOPE_SCHEMA, DocumentStore

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024
_ENVELOPE_COLS = [f.name for f in ENVELOPE_SCHEMA.fields]


def file_stats(index_path: str, small_file_bytes: int = 32 * 1024 * 1024) -> dict:
    """File-level shape of one index dir: the signal that decides
    whether compaction is worth a rewrite."""
    n_files = 0
    total = 0
    small = 0
    for dirpath, _dirs, files in os.walk(index_path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            sz = os.path.getsize(os.path.join(dirpath, f))
            n_files += 1
            total += sz
            if sz < small_file_bytes:
                small += 1
    return {
        "n_files": n_files,
        "total_bytes": total,
        "small_files": small,
        "avg_file_bytes": total // n_files if n_files else 0,
    }


def _is_type_partitioned(index_path: str) -> bool:
    return any(
        d.startswith("_type=")
        for d in os.listdir(index_path)
        if os.path.isdir(os.path.join(index_path, d))
    )


def compact_index(
    spark: SparkSession,
    store: DocumentStore,
    index: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    min_files_to_compact: int = 2,
    sort_by: "list[str] | None" = None,
) -> dict:
    """Rewrite one index's data files to ~target_file_bytes each.

    Returns {"before": stats, "after": stats, "compacted": bool}.
    No-op when the dir already has fewer files than the target implies
    (never rewrites 100 TB to fix nothing). The rewrite is a narrow
    read → repartition(n) → write to a temp dir → atomic rename, so a
    crash mid-compaction leaves the original data untouched; row
    content is bit-identical (no re-encoding of values, only file
    boundaries move).

    ``sort_by`` clusters the rewrite on those columns
    (repartitionByRange + sortWithinPartitions): each output file gets
    a disjoint min/max range in the parquet footer, so later range
    predicates on those columns skip whole files/row-groups — the
    Z-ORDER-lite layout step. Forces the rewrite even when file counts
    are fine (layout, not size, is the point).
    """
    path = store.index_path(index)
    before = file_stats(path, small_file_bytes=target_file_bytes // 4)
    n_out = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    if sort_by is None and before["n_files"] <= max(n_out, min_files_to_compact - 1):
        return {"before": before, "after": before, "compacted": False}

    partitioned = _is_type_partitioned(path)
    df = spark.read.parquet(path).select(*[c for c in _ENVELOPE_COLS])
    tmp = path + ".compact-" + uuid.uuid4().hex[:8]
    if sort_by:
        from pyspark.sql import functions as F

        shaped = df.repartitionByRange(n_out, *[F.col(c) for c in sort_by])
        shaped = shaped.sortWithinPartitions(*sort_by)
    else:
        shaped = df.repartition(n_out)
    writer = shaped.write.mode("overwrite")
    if partitioned:
        # one task writes at most one file per type ⇒ ≤ n_out files
        # per partition, and the pruned layout survives
        writer = writer.partitionBy("_type")
    writer.parquet(tmp)

    old = path + ".old-" + uuid.uuid4().hex[:8]
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "before": before,
        "after": file_stats(path, small_file_bytes=target_file_bytes // 4),
        "compacted": True,
    }


def compact_store(
    spark: SparkSession,
    store: DocumentStore,
    pattern: str = "*",
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> dict[str, dict]:
    """Compact every index matching the glob; returns per-index stats."""
    return {
        index: compact_index(spark, store, index, target_file_bytes)
        for index in store.list_data_indices(pattern)
    }
