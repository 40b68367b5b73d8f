"""Bucketed-table helpers: co-located joins without shuffles.

At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Writing
both sides bucketed by the join key (`bucketBy` + `sortBy`) lets Spark
plan a SortMergeJoin with NO Exchange on either side — each bucket pair
joins locally. These helpers wrap the write/read ceremony (bucketing
only works through the table catalog, not raw parquet paths).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.

    Drops any existing table AND its leftover warehouse location first
    (a dropped-in-a-previous-session managed table leaves its directory
    behind, which blocks re-creation)."""
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # managed-table location: <database location>/<table>. Resolve the
    # database through the catalog — an unqualified name belongs to the
    # CURRENT database (not necessarily 'default'), and a database's
    # directory can live anywhere; guessing '<warehouse>/<table>' would
    # clean the wrong path and leave the stale dir this guard exists
    # for exactly when a non-default database is in use.
    parts = table.lower().split(".")
    db = parts[-2] if len(parts) > 1 else spark.catalog.currentDatabase()
    db_loc = spark.catalog.getDatabase(db).locationUri
    location = os.path.join(db_loc.removeprefix("file:"), parts[-1])
    if os.path.isdir(location):
        shutil.rmtree(location)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    With matching bucket specs Catalyst plans SortMergeJoin without
    Exchange — verify with `.explain()`: no `Exchange hashpartitioning`
    above either scan. The MERGE hint pins SMJ (a broadcast would
    ignore the bucketing and re-ship one side, which is exactly what
    bucketing exists to avoid on fact⋈fact joins).
    """
    return spark.table(left_table).hint("MERGE").join(
        spark.table(right_table).hint("MERGE"), on, how
    )
