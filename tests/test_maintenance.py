"""Compaction: file counts shrink, content identical, pruned layout survives."""
from pyspark.sql import functions as F

from chillastic_spark.sources import DocumentStore
from chillastic_spark.sources.maintenance import compact_index, compact_store, file_stats


def _seed(spark, store, index, n=200, n_files=40, partitioned=False):
    df = (
        spark.range(n)
        .select(
            F.lit(index).alias("_index"),
            F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("_type"),
            F.col("id").cast("string").alias("_id"),
            F.to_json(F.struct(F.col("id").alias("v"))).alias("_source"),
            (F.col("id") % 7 + 1).alias("_size"),
        )
        .repartition(n_files)
    )
    store.write_documents(
        df, index, partition_by=["_type"] if partitioned else None
    )
    return df


def test_compact_shrinks_files_preserves_rows(spark, tmp_path):
    store = DocumentStore(str(tmp_path / "store"))
    _seed(spark, store, "idx1")
    before = file_stats(store.index_path("idx1"))
    assert before["n_files"] >= 30
    want = sorted(
        (r["_id"], r["_source"]) for r in store.read(spark, "idx1").collect()
    )
    out = compact_index(spark, store, "idx1", target_file_bytes=64 * 1024 * 1024)
    assert out["compacted"] and out["after"]["n_files"] < before["n_files"]
    got = sorted(
        (r["_id"], r["_source"]) for r in store.read(spark, "idx1").collect()
    )
    assert got == want


def test_compact_preserves_type_partition_pruning(spark, tmp_path):
    store = DocumentStore(str(tmp_path / "store"))
    _seed(spark, store, "idx2", partitioned=True)
    out = compact_index(spark, store, "idx2", target_file_bytes=64 * 1024 * 1024)
    assert out["compacted"]
    # layout survived: hive dirs still present and the per-type scan
    # plan prunes partitions instead of filtering rows
    df = spark.read.parquet(store.index_path("idx2")).filter(F.col("_type") == "t1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(_type" in plan
    assert df.count() == store.read(spark, "idx2", type="t1").count() > 0


def test_compact_is_noop_when_already_compact(spark, tmp_path):
    store = DocumentStore(str(tmp_path / "store"))
    _seed(spark, store, "idx3", n_files=1)
    out = compact_store(spark, store)
    assert out["idx3"]["compacted"] is False
    assert out["idx3"]["after"] == out["idx3"]["before"]


def test_sorted_compaction_gives_disjoint_file_ranges(spark, tmp_path):
    """sort_by clustering must leave each parquet file with a disjoint
    _size min/max footer range — the property file/row-group skipping
    needs for range predicates."""
    import glob

    import pyarrow.parquet as pq

    store = DocumentStore(str(tmp_path / "store"))
    df = _seed(spark, store, "idx4", n=4000, n_files=20)
    out = compact_index(
        spark, store, "idx4", target_file_bytes=16 * 1024, sort_by=["_size"]
    )
    assert out["compacted"] and out["after"]["n_files"] >= 2
    ranges = []
    for f in glob.glob(store.index_path("idx4") + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "_size"
        )
        stats = [md.row_group(g).column(col_idx).statistics for g in range(md.num_row_groups)]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (boundary value may touch)
    # content unchanged
    assert store.read(spark, "idx4").count() == 4000
