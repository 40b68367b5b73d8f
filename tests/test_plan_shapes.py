"""Plan-shape regression guards: the optimizations that matter at
100 TB must stay visible in the physical plan — a refactor that loses
a pushdown or broadcasts nothing should fail here, not at the bench.
"""
import pytest

from chillastic_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = all_queries()[name].fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushed_and_pruned(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns reach the scan
    assert "l_comment" not in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert read.count(":") <= 9  # 7 cols + struct<> syntax


def test_q6_all_filters_pushed(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    for f in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({f})" in plan


def test_q3_broadcasts_dimensions(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_all_dims(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    # customer/supplier/nation/region all broadcast → ≥4 broadcast joins
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan or plan.count("Exchange") <= 4


def test_scan_projection_reads_three_columns(spark):
    plan = _plan(spark, "scan_projection")
    assert "GreaterThanOrEqual(n_chars,100)" in plan
    assert "text" not in [  # the wide text column must NOT be read
        seg for seg in plan.split("ReadSchema: ")[1].split("\n")[0].split(",")
    ]


def test_dedup_has_no_cartesian(spark):
    for name in ("dedup_ngram_jaccard", "dedup_minhash_lsh", "embedding_dup_pairs"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_topk_per_group_uses_window_group_limit(spark):
    """row_number()<=k must compile to Partial+Final WindowGroupLimit:
    each map task keeps only k rows per group BEFORE the shuffle, so a
    low-cardinality partition key (4 languages) is not a skew bomb."""
    plan = _plan(spark, "quality_topk_per_lang")
    assert plan.count("WindowGroupLimit") >= 2
    assert "Partial" in plan  # the map-side phase is present
