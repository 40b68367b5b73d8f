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

    big gets a random-ish deterministic salt (hash of all columns mod R
    would be ideal; monotonically varying row id suffices and avoids a
    wide hash); small is exploded ×R. Correct for inner/left joins on
    equi-keys. Use when key-frequency skew defeats AQE (e.g. a single
    null-ish key holding >1 partition's worth of rows).
    """
    salted_big = big.withColumn(
        "__salt", (F.spark_partition_id() + F.monotonically_increasing_id()) % salt_buckets
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
