"""Dataset-assembly expressions shared by the pipeline stage
(pipelines.assemble) and its oracle-checked query twins
(queries/analytics10.py) — ONE definition of the leakage-critical
split/shard hashing so the two callers cannot de-synchronize.

The DuckDB twins of these expressions live next to the queries; the
driver's hash equality on `leakage_safe_splits` / `shard_manifest` is
what pins this module's semantics.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chillastic_spark import functions as CF

TRAIN_PCT, VAL_PCT = 90, 5  # train < 90, val < 95, test < 100
N_SHARDS = 8


def rep_of(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """``df`` plus a ``rep_id`` column: the doc's near-dup-component
    representative (smallest id; itself when it has no near-dups).
    ``pairs`` docs absent from ``df`` are ignored (left join)."""
    from chillastic_spark.operators.components import connected_components

    comp = connected_components(pairs).withColumnRenamed("node", id_col)
    return df.join(comp, id_col, "left").withColumn(
        "rep_id", F.coalesce("component", id_col)
    ).drop("component")


def split_of(
    rep: Column, train_pct: int = TRAIN_PCT, val_pct: int = VAL_PCT
) -> Column:
    """'train' | 'val' | 'test' from the REPRESENTATIVE id — hashing
    the rep (never the doc) is what keeps near-duplicates from
    straddling splits."""
    bucket = CF.hash60(F.concat(rep.cast("string"), F.lit("#split"))) % 100
    return (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )


def shard_of(doc_id: Column, n_shards: int = N_SHARDS) -> Column:
    """Stateless reproducible shard assignment by doc-id hash."""
    return CF.hash60(F.concat(doc_id.cast("string"), F.lit("#shard"))) % n_shards


def assemble_incremental(
    new_docs: DataFrame,
    existing_manifest: DataFrame,
    flags: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    train_pct: int = TRAIN_PCT,
    val_pct: int = VAL_PCT,
    n_shards: int = N_SHARDS,
    batch_pairs: "DataFrame | None" = None,
) -> DataFrame:
    """Split/shard assignment for an INGEST BATCH that keeps every
    published assignment stable: a new doc that near-duplicates an
    existing doc inherits that doc's representative — and therefore
    its split — so near-dups never straddle splits across ingests.
    Docs with no match hash their own id (identical to a from-scratch
    assignment, since the split hash keys on the representative).

    ``flags`` is the incremental-dedup output — (doc_id, match_id)
    pairs of new docs vs the existing corpus
    (``dedup.minhash_lsh_incremental`` / the streaming twin); multiple
    matches adopt the smallest existing representative.

    ``batch_pairs`` (optional) are near-dup pairs WITHIN the batch
    (id_a, id_b): in-batch clusters are co-assigned — the whole
    cluster takes the smallest published rep any member matched, or
    the cluster's smallest member id when none did. Without it, two
    new near-dups that match nothing published would hash
    independently and could straddle splits.

    Stability contract: published reps are adopted VERBATIM (never
    min-ed with new ids), so re-assigning or re-ordering ingests can
    never change an already-published row; the price is that rep ids
    depend on arrival order (co-assignment — the leakage invariant —
    does not).

    Returns the ingest batch's manifest rows (id, source, rep_id,
    split, shard) — append them to the published manifest.
    """
    ex_rep = existing_manifest.select(
        F.col(id_col).alias("__match_id"), F.col("rep_id").alias("__ex_rep")
    )
    adopted = (
        flags.select(
            F.col(id_col), F.col("match_id").alias("__match_id")
        )
        .join(ex_rep, "__match_id")
        .groupBy(id_col)
        .agg(F.min("__ex_rep").alias("__adopted_rep"))
    )
    m = new_docs.select(id_col, source_col).join(adopted, id_col, "left")
    if batch_pairs is not None:
        from chillastic_spark.operators.components import connected_components
        from chillastic_spark.persist import materialize

        comp = connected_components(batch_pairs).withColumnRenamed(
            "node", id_col
        )
        m = m.join(comp, id_col, "left").withColumn(
            "__cluster", F.coalesce("component", F.col(id_col))
        )
        # m feeds BOTH the cluster-adoption agg and the final join —
        # pin it so the flags-manifest join runs once per micro-batch
        # (the streaming callers' batch_scope releases it at exit)
        m = materialize(m)
        cluster_adopt = m.groupBy("__cluster").agg(
            F.min("__adopted_rep").alias("__cluster_rep")
        )
        m = (
            m.join(cluster_adopt, "__cluster")
            .select(
                id_col,
                source_col,
                # component IS the cluster's smallest member id
                F.coalesce("__cluster_rep", F.col("__cluster")).alias("rep_id"),
            )
        )
    else:
        m = m.select(
            id_col,
            source_col,
            F.coalesce("__adopted_rep", F.col(id_col)).alias("rep_id"),
        )
    return m.select(
        id_col,
        source_col,
        "rep_id",
        split_of(F.col("rep_id"), train_pct, val_pct).alias("split"),
        shard_of(F.col(id_col), n_shards).alias("shard"),
    )


def write_sharded(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    n_shards: int = N_SHARDS,
    split_col: str = "split",
) -> None:
    """Materialize the training set as the directory tree the shard
    manifest describes: ``out_dir/split=<s>/shard=<k>/`` with EXACTLY
    one parquet file per (split, shard) — repartition by the same
    hash expressions that built the manifest, so file contents are
    reproducible from any number of writers and each shard is one
    sequential read for a training loader.

    One-file-per-shard is the 100 TB layout contract (shards are
    sized by choosing ``n_shards``, docs land by id hash); writers
    scale by raising ``n_shards``, never by splitting a shard's file.

    When ``df`` already carries a ``shard`` column (an ``assemble``
    manifest) it is AUTHORITATIVE and reused as-is — recomputing here
    with a different ``n_shards`` would silently diverge the tree
    from the published manifest.

    Sorting covers (split, shard, id): the dynamic-partition writer
    requires ordering by the partition columns, so including them
    means no second sort is inserted and intra-file id order — hence
    byte-reproducible files — is actually guaranteed.
    """
    if "shard" not in df.columns:
        df = df.withColumn("shard", shard_of(F.col(id_col), n_shards))
    (
        df.repartition(F.col(split_col), F.col("shard"))
        .sortWithinPartitions(split_col, "shard", id_col)
        .write.partitionBy(split_col, "shard")
        .mode("overwrite")
        .parquet(out_dir)
    )
