"""Idempotent upsert sink (SURVEY §2.1 S4/S5).

The reference achieves effectively-once delivery with at-least-once
scroll + ``doc_as_upsert`` bulk updates (transfer.js:175-189). The
Spark-native equivalent is a MERGE on ``(_index,_type,_id)``: new rows
replace existing rows with the same key, unseen keys append.

On parquet (this repo's storage) the merge is BUCKET-SCOPED: every
index is laid out in N hash buckets of ``_id`` (sources.bucket_expr),
and a batch rewrites only the buckets containing its keys — read the
touched 1/N-th, ``existing ⟕anti new ∪ new``, atomic per-bucket dir
swap. Write amplification is O(|index|·touched/N) per batch instead of
O(|index|): a 1k-doc micro-batch against a 1 TB index touches ≤1k
buckets' worth of data, not the whole terabyte. On a real deployment
the same call maps 1:1 to Delta/Iceberg ``MERGE INTO`` over a
bucket-partitioned table (transactional, partition-pruned), which is
the 100 TB path; the dir swap here exists only because plain parquet
has no transaction log.

The first upsert against a flat index migrates it to the bucketed
layout (one full rewrite, once), mirroring how a Delta conversion works.
"""
from __future__ import annotations

import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chillastic_spark.locks import FileLock
from chillastic_spark.sources import (
    ENVELOPE_SCHEMA,
    N_BUCKETS_DEFAULT,
    DocumentStore,
    bucket_expr,
)

KEY = ["_index", "_type", "_id"]


def _key_cond(a: DataFrame, b: DataFrame):
    """Null-safe key equality for the MERGE anti-join: a plain
    ``join(KEY)`` never matches NULL == NULL, so a null-typed doc
    (typeless ES 7+/8 envelopes) would DUPLICATE on every re-upsert
    instead of replacing — the anti-join must treat NULL keys as
    equal, exactly like the within-batch dedup window (whose
    partitionBy groups NULLs together)."""
    import functools
    import operator

    return functools.reduce(
        operator.and_, [a[k].eqNullSafe(b[k]) for k in KEY]
    )

# The parquet store has no transaction log, so one-writer-per-index is
# enforced here: concurrent read-merge-swap on the same index dir
# (Engine.run_task parallelism>1, or two REST /_run calls in the same
# process) would lose one writer's rows or crash mid-os.rename. Cross-
# PROCESS safety comes from the fcntl lock in locks.py. Delta/Iceberg
# MERGE replaces both with real transactions at scale.
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


def _auto_buckets(index_path: str) -> int:
    """Bucket count for a first-time migration: one bucket per ~256 MB
    of existing data, power of two, clamped to [N_BUCKETS_DEFAULT, 4096].

    The merge prunes to the buckets holding batch keys, and k uniform
    keys touch ~k buckets — so the pruning only bites when N is well
    above the batch size. Sizing N by bytes keeps both properties at
    any scale: a 1 TB index gets 4096 buckets (a 1k-doc batch rewrites
    ≤¼ of it, a 100-doc micro-batch ≤2.5%), while a test-sized index
    stays at the floor and out of small-file territory."""
    import math

    from chillastic_spark.sources.maintenance import file_stats

    total = file_stats(index_path)["total_bytes"] if os.path.isdir(index_path) else 0
    target = max(total // (256 << 20), 1)
    n = 1 << math.ceil(math.log2(target)) if target > 1 else 1
    return min(max(n, N_BUCKETS_DEFAULT), 4096)


def upsert(
    spark: SparkSession,
    store: DocumentStore,
    df: DataFrame,
    n_buckets: "int | None" = None,
) -> int:
    """MERGE ``df`` into ``store`` keyed on (_index,_type,_id).

    Within-batch duplicates keep ONE row chosen by a deterministic
    tie-break (highest md5(_source), then _size) — "arrival order" is
    not meaningful in a distributed DataFrame, and the stable winner
    keeps re-runs (and the Delta sink, which pins the SAME rule)
    byte-identical. Returns rows delivered. ``n_buckets``
    applies only when an index is first converted to the bucketed
    layout (default: sized from the index bytes, see _auto_buckets);
    an already-bucketed index keeps its pinned N.
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
        if any(ix is None for ix in indices):
            raise ValueError(
                "upsert: rows with NULL _index cannot be delivered — "
                "every envelope row needs a destination index"
            )
        # NULL _id is equally undeliverable, and worse than a failed
        # merge: xxhash64(NULL) yields a NULL bucket, which crashes the
        # touched-bucket sort on a bucketed index and lands rows in a
        # __HIVE_DEFAULT_PARTITION__ dir on migration — where the
        # bucket-id parse aborts MID-rename-loop (rows already moved
        # duplicate on retry). Validate up front like _index.
        if df.filter(F.col("_id").isNull()).limit(1).count():
            raise ValueError(
                "upsert: rows with NULL _id cannot be delivered — the "
                "merge key and the bucket hash both need a document id"
            )
        for index in indices:
            batch = df.filter(F.col("_index") == index)
            delivered += batch.count()  # rows delivered = batch size
            # thread lock serializes in-process writers; the flock makes
            # a second PROCESS wait instead of racing the dir swaps
            with _index_lock(store.index_path(index)), FileLock(
                store.index_path(index) + ".lock"
            ):
                # heal any interrupted swap from a crashed prior
                # delivery BEFORE reading — BOTH levels: the index-level
                # two-rename window (migration/_atomic_replace — a
                # missing live dir with the only copy stranded in
                # .old-; restoring it + the idempotent re-merge is
                # exactly-once) and the bucket-level window (a bucket
                # whose live dir died mid-swap reads as empty, and
                # merging against "empty" would permanently drop its
                # pre-crash rows)
                from chillastic_spark.sources import store_swap_window
                from chillastic_spark.sources.maintenance import (
                    _recover_interrupted_swap,
                    recover_bucket_swaps,
                )

                with store_swap_window(store.index_path(index)):
                    _recover_interrupted_swap(store.index_path(index))
                    recover_bucket_swaps(store.index_path(index))
                nb = store.bucket_count(index)
                if nb is None:
                    from chillastic_spark.sources.maintenance import (
                        _is_type_partitioned,
                    )

                    existing = store.read(spark, index)
                    merged = _normalise(
                        existing.join(batch, _key_cond(existing, batch), "left_anti")
                        .unionByName(batch)
                    )
                    if os.path.isdir(
                        store.index_path(index)
                    ) and _is_type_partitioned(store.index_path(index)):
                        # an index laid out with Hive _type= partitions
                        # (write_documents(partition_by=['_type']) — the
                        # layout its docstring recommends at scale) must
                        # KEEP that layout: silently rewriting it
                        # bucketed would destroy the per-type partition
                        # pruning and blind any stream reading the typed
                        # subdirs — the same guarantee _atomic_replace
                        # makes for compaction
                        _replace_index_type_partitioned(store, index, merged)
                    else:
                        # one-time migration: flat (or empty) → bucketed
                        n = n_buckets or _auto_buckets(store.index_path(index))
                        if not 0 < n <= 9999:
                            # bucket dirs are bucket-NNNN and the stream
                            # glob matches exactly 4 digits — a 5-digit
                            # bucket id would be written but silently
                            # excluded from readStream
                            raise ValueError(
                                f"n_buckets must be in [1, 9999] (got {n})"
                            )
                        _replace_index_bucketed(store, index, merged, n)
                else:
                    touched = sorted(
                        r["b"]
                        for r in batch.select(bucket_expr(nb).alias("b"))
                        .distinct()
                        .collect()
                    )
                    existing = store.read(spark, index, buckets=touched)
                    merged = _normalise(
                        existing.join(batch, _key_cond(existing, batch), "left_anti")
                        .unionByName(batch)
                    )
                    _replace_buckets(store, index, nb, merged, touched)
        return delivered
    finally:
        df.unpersist()


def _write_bucket_tmp(
    store: DocumentStore, index: str, df: DataFrame, n_buckets: int
) -> str:
    """Materialise ``df`` into a temp dir partitioned by hash bucket.

    The write runs BEFORE any live dir is touched, so a crash mid-merge
    leaves the index exactly as it was."""
    tmp = store.index_path(index) + ".merge-" + uuid.uuid4().hex[:8]
    df.withColumn("__bucket", bucket_expr(n_buckets)).write.partitionBy(
        "__bucket"
    ).parquet(tmp)
    return tmp


def _swap_bucket(tmp: str, store: DocumentStore, index: str, b: int) -> None:
    """Atomically install ``tmp/__bucket=b`` as the live bucket dir;
    a bucket with no surviving rows is deleted (absent == empty)."""
    from chillastic_spark.sources import store_swap_window

    src = os.path.join(tmp, f"__bucket={b}")
    target = store.bucket_path(index, b)
    old = target + ".old-" + uuid.uuid4().hex[:8]
    # rename window under the index's swap lock (r10): readers list
    # bucket dirs under the SHARED side, so a read can never see this
    # bucket mid-rename and silently serve the index without it
    with store_swap_window(store.index_path(index)):
        if os.path.exists(target):
            os.rename(target, old)
        if os.path.isdir(src):
            os.rename(src, target)
        if os.path.exists(old):
            shutil.rmtree(old)


def _replace_buckets(
    store: DocumentStore, index: str, n_buckets: int, merged: DataFrame,
    touched: list[int],
) -> None:
    """Rewrite ONLY the touched buckets. Untouched bucket dirs (the
    other N−|touched|) are never opened, listed, or rewritten."""
    tmp = _write_bucket_tmp(store, index, merged, n_buckets)
    try:
        for b in touched:
            _swap_bucket(tmp, store, index, b)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _replace_index_bucketed(
    store: DocumentStore, index: str, merged: DataFrame, n_buckets: int
) -> None:
    """Full rewrite into the bucketed layout (migration / first write)."""
    from chillastic_spark.sources import BUCKET_MARKER

    target = store.index_path(index)
    tmp = _write_bucket_tmp(store, index, merged, n_buckets)
    new = target + ".new-" + uuid.uuid4().hex[:8]
    try:
        os.makedirs(new)
        for d in os.listdir(tmp):
            if d.startswith("__bucket="):
                b = int(d.split("=", 1)[1])
                os.rename(
                    os.path.join(tmp, d),
                    os.path.join(
                        new, f"{os.path.basename(store.bucket_path(index, b))}"
                    ),
                )
        # marker rides the swap: the new dir is born bucketed, so no
        # crash window exists where bucket dirs are visible under a
        # "flat" index
        with open(os.path.join(new, BUCKET_MARKER), "w") as f:
            f.write(str(n_buckets))
    except BaseException:
        # an exception mid-loop (ENOSPC, a corrupt partition dir name)
        # must not strand the half-built .new- dir forever — no
        # recovery path touches pre-swap scratch, and scratch-filtered
        # listings make the leaked bytes invisible
        shutil.rmtree(new, ignore_errors=True)
        raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    from chillastic_spark.sources import store_swap_window

    old = target + ".old-" + uuid.uuid4().hex[:8]
    with store_swap_window(target):
        if os.path.exists(target):
            os.rename(target, old)
        os.rename(new, target)
        if os.path.exists(old):
            shutil.rmtree(old)


def _replace_index_type_partitioned(
    store: DocumentStore, index: str, merged: DataFrame
) -> None:
    """Merge-rewrite an index ALREADY laid out with Hive ``_type=``
    partitions, preserving that layout (same tail-swap shape as the
    bucketed replace, so _recover_interrupted_swap owns the crash
    windows)."""
    target = store.index_path(index)
    new = target + ".new-" + uuid.uuid4().hex[:8]
    try:
        merged.write.partitionBy("_type").parquet(new)
    except BaseException:
        shutil.rmtree(new, ignore_errors=True)
        raise
    from chillastic_spark.sources import store_swap_window

    old = target + ".old-" + uuid.uuid4().hex[:8]
    with store_swap_window(target):
        os.rename(target, old)
        os.rename(new, target)
        shutil.rmtree(old)


def purge(
    spark: SparkSession,
    store: DocumentStore,
    index: str,
    ids: DataFrame | list[str],
    type: "str | None" = None,
) -> int:
    """Targeted delete by document id (right-to-be-forgotten): rewrite
    WITHOUT the given ``_id``s and atomically swap — bucket-scoped on a
    bucketed index (only buckets holding victim ids are rewritten).

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
    # NULL victim ids match nothing in the anti-join (the es_purge
    # convention) — and a NULL bucket hash would crash the touched-
    # bucket sort below, so drop them before planning
    victims = id_df.filter(F.col("_id").isNotNull()).distinct()
    with _index_lock(store.index_path(index)), FileLock(
        store.index_path(index) + ".lock"
    ):
        from chillastic_spark.sources import store_swap_window
        from chillastic_spark.sources.maintenance import (
            _recover_interrupted_swap,
            recover_bucket_swaps,
        )

        with store_swap_window(store.index_path(index)):
            _recover_interrupted_swap(store.index_path(index))
            recover_bucket_swaps(store.index_path(index))
        nb = store.bucket_count(index)
        buckets = None
        if nb is not None:
            buckets = sorted(
                r["b"]
                for r in victims.select(bucket_expr(nb).alias("b"))
                .distinct()
                .collect()
            )
        existing = store.read(spark, index, buckets=buckets)
        if type is not None:
            match = existing.filter(F.col("_type") == type).join(victims, "_id", "semi")
            kept = existing.join(
                match.select("_type", "_id"), ["_type", "_id"], "left_anti"
            )
            removed = match.count()
        else:
            kept = existing.join(victims, "_id", "left_anti")
            # one narrow semi-join count (the dual of the typed
            # branch's match.count) instead of two full scans
            removed = existing.join(victims, "_id", "semi").count()
        if removed == 0:
            return 0
        if nb is not None:
            _replace_buckets(store, index, nb, _normalise(kept), buckets)
        else:
            _atomic_replace(store, index, _normalise(kept))
    return removed


def _atomic_replace(store: DocumentStore, index: str, merged: DataFrame) -> None:
    """Whole-dir swap for a FLAT index (purge on never-upserted data).
    A Hive ``_type=`` layout is preserved (the same detection
    compaction uses) — rewriting it flat would silently destroy the
    partition pruning every per-type read depends on."""
    from chillastic_spark.sources.maintenance import _is_type_partitioned

    target = store.index_path(index)
    tmp = target + ".tmp-" + uuid.uuid4().hex[:8]
    writer = merged.write.mode("overwrite")
    if os.path.isdir(target) and _is_type_partitioned(target):
        writer = writer.partitionBy("_type")
    writer.parquet(tmp)
    from chillastic_spark.sources import store_swap_window

    old = target + ".old-" + uuid.uuid4().hex[:8]
    with store_swap_window(target):
        if os.path.exists(target):
            os.rename(target, old)
        os.rename(tmp, target)
        if os.path.exists(old):
            shutil.rmtree(old)
