"""Error-bound pins for the approximate (sketch) queries — the checks
the duckdb hash-gate can't do for approximate-by-design operators."""
from __future__ import annotations

from pyspark.sql import functions as F

from chillastic_spark.queries.analytics2 import (
    sketch_distinct_users,
    sketch_value_quantiles,
)
from chillastic_spark.tables import load

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_error(spark):
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in sketch_distinct_users(spark, SF).collect()
    }
    assert approx.keys() == exact.keys()
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(3, 0.05 * n), (t, approx[t], n)


def test_gk_quantiles_within_rank_error(spark):
    """Each approx quantile must sit within ±1% rank of the exact one."""
    e = load(spark, SF, "events")
    got = {r["event_type"]: r for r in sketch_value_quantiles(spark, SF).collect()}
    for t, row in got.items():
        vals = sorted(
            r["value"] for r in e.filter(F.col("event_type") == t).select("value").collect()
        )
        n = len(vals)
        for p, v in ((0.25, row["p25"]), (0.5, row["p50"]), (0.9, row["p90"])):
            lo = vals[max(0, int((p - 0.01) * n) - 1)]
            hi = vals[min(n - 1, int((p + 0.01) * n))]
            assert lo <= v <= hi, (t, p, v, lo, hi)


def test_sketches_are_deterministic(spark):
    a = sorted(map(tuple, sketch_distinct_users(spark, SF).collect()))
    b = sorted(map(tuple, sketch_distinct_users(spark, SF).collect()))
    assert a == b


def test_mg_sentinel_cannot_collide_with_corpus_tokens(spark):
    """A NUL-containing corpus token must not be folded into the error
    bound: the sentinel contains a space, which whitespace-split tokens
    never can."""
    from chillastic_spark.operators.sketches import _DECR_SENTINEL, heavy_hitter_tokens

    assert " " in _DECR_SENTINEL
    evil = "\x00__MG_DECR__"  # the old sentinel, as a real corpus token
    df = spark.createDataFrame(
        [(f"{evil} {evil} normal token",)], "text: string"
    )
    got = {r["token"]: r["est"] for r in heavy_hitter_tokens(df, k=10).collect()}
    assert got.get(evil) == 2  # counted as a token, not error mass


def test_heavy_hitters_ignore_empty_documents(spark):
    """Review finding: split(trim('')) yields [''], so a corpus rich in
    empty/whitespace-only docs crowned '' the #1 heavy hitter and burned
    a capacity counter on a non-token."""
    from chillastic_spark.operators.sketches import heavy_hitter_tokens

    rows = [(i, "") for i in range(50)] + [(50 + i, "  \t ") for i in range(50)]
    rows += [(100 + i, "real tokens here") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["token"]: r["est"] for r in heavy_hitter_tokens(df, k=5).collect()}
    assert "" not in got
    assert got["real"] == 10


def test_salted_join_guards_outer_modes_and_reserved_column(spark):
    """Review finding: right/full outer salted joins silently duplicate
    every unmatched small row once per salt replica, and an existing
    __salt column was silently destroyed."""
    import pytest as _pytest

    from chillastic_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a")], "k long, x string")
    small = spark.createDataFrame([(1, "y"), (2, "z")], "k long, y string")
    for how in ("right", "full", "outer"):
        with _pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "k", how=how)
    with _pytest.raises(ValueError, match="__salt"):
        salted_join(big.withColumn("__salt", F.lit(1)), small, "k")
    # the supported modes still work and dedupe nothing
    assert salted_join(big, small, "k").count() == 1
    assert salted_join(big, small, "k", how="left_anti").count() == 0
