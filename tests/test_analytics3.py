"""Batch-7 operator tests: bucketed interval join correctness + plan
shape, deterministic sampling, quantization guards."""
import os

from pyspark.sql import functions as F

from chillastic_spark.queries.analytics3 import (
    purchase_prior_window,
    sample_stratified,
    embedding_int8_checksum,
)
from chillastic_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_interval_join_matches_naive_theta_join(spark):
    """The hour-bucketed equi-join must return exactly what the naive
    range join returns (boundary events at p_ts - 1h land in the
    previous bucket and must still be found)."""
    e = load(spark, SF, "events")
    a = e.filter(F.col("event_type") == "purchase").alias("a")
    b = e.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") >= F.col("a.ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("b.ts") < F.col("a.ts")),
        )
        .groupBy(F.col("a.event_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_prior"))
    )
    got = {
        r["event_id"]: r["n_prior"]
        for r in purchase_prior_window(spark, SF).collect()
    }
    want = {r["event_id"]: r["n_prior"] for r in naive.collect()}
    assert got == want
    assert len(got) > 0


def test_interval_join_plan_has_no_nested_loop(spark):
    """The whole point of bucketing: no BroadcastNestedLoopJoin or
    CartesianProduct may appear — those are the O(n²) shapes a naive
    range join degenerates to at scale."""
    plan = purchase_prior_window(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sample_stratified_is_deterministic_and_stratified(spark):
    s1 = sorted(r["doc_id"] for r in sample_stratified(spark, SF).collect())
    s2 = sorted(r["doc_id"] for r in sample_stratified(spark, SF).collect())
    assert s1 == s2 and len(s1) > 0
    # en is downsampled harder than the tail languages
    total = load(spark, SF, "documents").groupBy("lang").count()
    kept = sample_stratified(spark, SF).groupBy("lang").count().withColumnRenamed(
        "count", "kept"
    )
    rates = {
        r["lang"]: r["kept"] / r["count"]
        for r in total.join(kept, "lang").collect()
    }
    assert rates["en"] < 0.45  # nominal 20%


def test_embedding_quantization_bounds(spark):
    rows = embedding_int8_checksum(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        # |q| <= 127 per element => L1 bounded by 127 * dims (scale is max-abs)
        assert r["q_l1"] <= 127 * r["n_dims"]
        assert abs(r["q_sum"]) <= r["q_l1"]


def test_decontaminate_plan_broadcasts_bench_grams(spark):
    from chillastic_spark.queries.analytics3 import decontaminate_flags

    df = decontaminate_flags(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the corpus side must not shuffle for the semi-join: bench grams broadcast
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert df.count() >= 0


def test_audio_features_plumbing(spark):
    from chillastic_spark.operators.multimodal import audio_features, with_binary_payload

    d = with_binary_payload(load(spark, SF, "documents").limit(20))
    out = audio_features(d, fake=True).collect()
    assert len(out) == 20
    for r in out:
        assert r["n_samples"] == 4000  # 8000 fake bytes -> int16
        assert r["n_frames"] == 1 + (4000 - 400) // 160
        assert 0.0 <= r["zcr"] <= 1.0 and r["max_rms"] >= r["mean_rms"] >= 0.0
    # deterministic across runs (retry-safe)
    again = audio_features(d, fake=True).collect()
    assert sorted((r["doc_id"], r["mean_rms"]) for r in again) == sorted(
        (r["doc_id"], r["mean_rms"]) for r in out
    )


def test_audio_features_real_decode_is_gated(spark):
    import pytest as _pytest
    from chillastic_spark.operators.multimodal import audio_features, with_binary_payload

    d = with_binary_payload(load(spark, SF, "documents").limit(1))
    with _pytest.raises(Exception, match="audio decode"):
        audio_features(d, fake=False).collect()


def test_daily_rollup_cascade_equals_direct(spark):
    """Re-aggregating the hourly pre-aggregate must equal aggregating
    raw events directly (counts exact, sums within rounding)."""
    from chillastic_spark.queries.analytics3 import events_daily_rollup

    got = {
        (r["day"], r["event_type"]): (r["cnt"], round(r["sum_value"], 1))
        for r in events_daily_rollup(spark, SF).collect()
    }
    e = load(spark, SF, "events")
    direct = (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    )
    want = {
        (r["day"], r["event_type"]): (r["cnt"], round(r["sum_value"], 1))
        for r in direct
    }
    assert got == want and len(got) > 0
