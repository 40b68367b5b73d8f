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


def test_lsh_multiprobe_improves_recall(spark):
    """Recall@10 of multi-probe LSH vs brute force on real embeddings."""
    from chillastic_spark.operators.similarity import brute_force_topk, lsh_topk
    from chillastic_spark.tables import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(e, q, k=10).collect()
    }

    def recall(probes):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_topk(e, q, k=10, planes=3, probes=probes).collect()
        }
        return len(got & truth) / len(truth)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1  # more probes never hurt recall
    # measured on this corpus: ~0.18 single-probe → ~0.61 with 4 probes
    assert r4 >= 0.45


def test_ivf_topk_recall_and_probe_monotonic(spark):
    """IVF recall@10 vs brute force; probing more cells never hurts,
    and probing ALL cells is exhaustive (recall 1.0)."""
    from chillastic_spark.operators.similarity import brute_force_topk, ivf_topk
    from chillastic_spark.tables import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(e, q, k=10).collect()
    }

    def recall(nprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(e, q, k=10, n_cells=8, nprobe=nprobe).collect()
        }
        return len(got & truth) / len(truth)

    r1, r3, r_all = recall(1), recall(3), recall(8)
    assert r3 >= r1
    assert r_all == 1.0  # probing every cell == brute force
    assert r3 >= 0.5


def test_ivf_assignment_is_deterministic_and_narrow(spark):
    """Same quantizer → same cell assignment across runs; the
    assignment plan contains no Exchange (narrow map stage)."""
    from chillastic_spark.operators.similarity import (
        ivf_assign_cells,
        ivf_coarse_centroids,
    )
    from chillastic_spark.tables import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    C = ivf_coarse_centroids(e, n_cells=8)
    a1 = ivf_assign_cells(e, C).select("vec_id", "cell")
    a2 = ivf_assign_cells(e, C).select("vec_id", "cell")
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    plan = a1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Co-located bucketed join: no Exchange above either scan."""
    from chillastic_spark.operators.bucketing import bucketed_join, write_bucketed

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(o, "b_orders", "o_orderkey", num_buckets=8)
    write_bucketed(l, "b_lineitem", "o_orderkey", num_buckets=8)

    joined = bucketed_join(spark, "b_orders", "b_lineitem", on="o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # the whole point: no shuffle
    assert joined.count() == l.count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
