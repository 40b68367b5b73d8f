"""Tests for the scale-pattern operators: as-of join, salted skew join."""
from pyspark.sql import functions as F

from chillastic_spark.operators.asof import asof_join
from chillastic_spark.operators.skew import salted_join, top_keys


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [("u1", 10, "p1"), ("u1", 20, "p2"), ("u2", 5, "p3"), ("u3", 7, "p4")],
        "k: string, ts: long, pid: string",
    )
    right = spark.createDataFrame(
        [("u1", 8, 1.0), ("u1", 15, 2.0), ("u1", 25, 3.0), ("u2", 5, 9.0)],
        "k: string, ts: long, v: double",
    )
    got = {
        r["pid"]: r["v"]
        for r in asof_join(left, right, key="k", ts="ts", value_cols=["v"]).collect()
    }
    assert got == {
        "p1": 1.0,   # latest right ≤ 10 is ts=8
        "p2": 2.0,   # latest ≤ 20 is ts=15
        "p3": 9.0,   # equal ts matches (non-strict)
        "p4": None,  # no right rows for u3 → left kept, null value
    }


def test_asof_join_strict(spark):
    left = spark.createDataFrame([("u2", 5, "p")], "k: string, ts: long, pid: string")
    right = spark.createDataFrame([("u2", 5, 9.0)], "k: string, ts: long, v: double")
    got = asof_join(left, right, key="k", ts="ts", value_cols=["v"], strict=True).collect()
    assert got[0]["v"] is None  # equality excluded when strict


def test_salted_join_matches_plain_join(spark):
    import random

    rng = random.Random(3)
    # heavy skew: 80% of rows share one key
    big = spark.createDataFrame(
        [(1 if rng.random() < 0.8 else rng.randint(2, 5), i) for i in range(2000)],
        "k: int, payload: int",
    )
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 6)], "k: int, name: string")
    plain = big.join(small, "k").groupBy("k").count().collect()
    salted = salted_join(big, small, on="k").groupBy("k").count().collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_top_keys_diagnostic(spark):
    df = spark.createDataFrame([(1,)] * 50 + [(2,)] * 3 + [(3,)] * 1, "k: int")
    got = top_keys(df, "k", k=2).collect()
    assert [(r["k"], r["freq"]) for r in got] == [(1, 50), (2, 3)]
