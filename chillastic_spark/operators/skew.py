"""Skew-handling join helpers.

AQE's skew-join split handles shuffle-stage skew automatically (enabled
in session.get_spark); these helpers cover the cases AQE can't:
exploding a BROADCASTABLE-but-hot dimension is unnecessary, but a
shuffled join where a handful of keys dominate benefits from salting —
replicate the small side R ways, scatter the big side across the
replicas, join on (key, salt).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the hot-key shuffle scattered over ``salt_buckets``.

    big's salt is a CONTENT hash of the whole row (xxhash64 over all
    columns, mod R); small is exploded ×R. The salt must be
    deterministic under recomputation: position-derived expressions
    (spark_partition_id / monotonically_increasing_id) change when a
    lost map stage is recomputed after a fetch failure, so a big row
    could land in a different salt bucket than the attempt reducers
    already fetched — duplicating or dropping join rows. Identical
    rows share a bucket under the content hash, which still scatters
    hot KEYS (the rows of a hot key differ in their other columns).
    Correct for inner/left joins on equi-keys — ENFORCED: under
    right/full outer joins every unmatched small-side row would
    surface once per salt replica (silently duplicated output). Use
    when key-frequency skew defeats AQE (e.g. a single null-ish key
    holding >1 partition's worth of rows).
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only (got {how!r}): "
            "the exploded small side duplicates unmatched rows under "
            "right/full outer semantics"
        )
    # same reserved-column guard as asof/interval: silently overwriting
    # and then dropping a caller's __salt would lose user data
    if "__salt" in big.columns or "__salt" in small.columns:
        raise ValueError("salted_join reserves the column name '__salt'")
    # validate up front like the minhash band/hamming chunk params: a
    # non-positive bucket count otherwise fails mid-job under ANSI
    # (pmod REMAINDER_BY_ZERO) or — ANSI off — pmod yields NULL and the
    # equi-join silently matches nothing
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    # xxhash64 rejects MAP-typed inputs (DATATYPE_MISMATCH) — a fact
    # table with a metadata/properties map column could not be salted
    # at all. Serialize unhashable columns through to_json (still
    # deterministic content); hash everything else directly.
    from pyspark.sql.types import MapType

    hash_inputs = [
        F.to_json(F.struct(F.col(f.name)))
        if isinstance(f.dataType, MapType)
        else F.col(f.name)
        for f in big.schema.fields
    ]
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*hash_inputs), F.lit(salt_buckets)),
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


def top_keys(df: DataFrame, on: str, k: int = 10) -> DataFrame:
    """Diagnostic: the k heaviest join keys and their frequencies —
    what you look at before deciding to salt."""
    return (
        df.groupBy(on)
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc(on))
        .limit(k)
    )
