"""operators/graph.py PageRank: NumPy-free pure-Python replay parity,
known-graph sanity, dangling handling, and determinism."""
import pytest
from pyspark.sql import functions as F

from chillastic_spark.operators import graph


def _spark_ranks(spark, edge_list, **kw):
    e = spark.createDataFrame(edge_list, "src: long, dst: long")
    return {
        r["node"]: r["rank"] for r in graph.pagerank(e, **kw).collect()
    }


def test_pagerank_matches_local_replay(spark):
    edges = [
        (1, 2), (2, 1), (2, 3), (3, 1), (4, 1), (5, 4), (5, 1), (6, 5),
        (7, 1), (1, 7),
    ]
    got = _spark_ranks(spark, edges, iters=8)
    want = graph.pagerank_local(edges, iters=8)
    assert got == want


def test_pagerank_star_center_dominates(spark):
    # star: everyone points at 0 (0 is dangling)
    edges = [(i, 0) for i in range(1, 8)]
    got = _spark_ranks(spark, edges, iters=10)
    assert got == graph.pagerank_local(edges, iters=10)
    center = got[0]
    assert all(center > got[i] for i in range(1, 8))
    # total mass ≈ N (damped formulation with dangling redistribution)
    assert abs(sum(got.values()) - 8) < 0.01


def test_pagerank_symmetric_cycle_uniform(spark):
    edges = [(i, (i + 1) % 5) for i in range(5)]
    got = _spark_ranks(spark, edges, iters=12)
    assert len(set(got.values())) == 1  # perfect symmetry → equal ranks
    assert got == graph.pagerank_local(edges, iters=12)


def test_pagerank_deterministic_across_partitionings(spark):
    edges = [(i, (i * 7) % 23) for i in range(60) if i != (i * 7) % 23]
    a = _spark_ranks(spark, edges, iters=6)
    e2 = (
        spark.createDataFrame(edges, "src: long, dst: long")
        .repartition(13)
    )
    b = {r["node"]: r["rank"] for r in graph.pagerank(e2, iters=6).collect()}
    assert a == b == graph.pagerank_local(edges, iters=6)


def test_pagerank_on_knn_graph(spark):
    """Centrality over the corpus k-NN graph: runs end-to-end on real
    embeddings and matches the local replay on the same edge list."""
    from chillastic_spark.queries import all_queries

    edges_df = (
        all_queries()["knn_graph_edges"]
        .fn(spark, "/root/testdata/sf0.001")
        .select("src", "dst")
    )
    edge_list = [(r["src"], r["dst"]) for r in edges_df.collect()]
    got = {r["node"]: r["rank"] for r in graph.pagerank(edges_df, iters=5).collect()}
    assert got == graph.pagerank_local(edge_list, iters=5)
    assert len(got) > 100


def test_label_propagation_matches_local_replay(spark):
    edges = [(i, (i * 5 + 1) % 17) for i in range(17)] + [(3, 4), (4, 5)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src: long, dst: long").repartition(7)
    got = {
        r["node"]: r["label"]
        for r in graph.label_propagation(df, iters=3).collect()
    }
    assert got == graph.label_propagation_local(edges, iters=3)


def test_label_propagation_two_cliques(spark):
    """Two triangles joined by one bridge edge settle on per-clique
    labels: each community adopts its smallest member id."""
    tri = lambda base: [(base, base + 1), (base + 1, base + 2), (base, base + 2)]
    edges = tri(0) + tri(10) + [(2, 10)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {
        r["node"]: r["label"]
        for r in graph.label_propagation(df, iters=4).collect()
    }
    assert got == graph.label_propagation_local(edges, iters=4)
    assert got[0] == got[1] == got[2] == 0
    assert got[11] == got[12]


def test_pagerank_under_cluster_persist_modes(spark, monkeypatch, tmp_path):
    """The shared persist policy applies to the iterative operators:
    pagerank under mode=disk (escalates to a RELIABLE checkpoint —
    lineage must be cut every round) and mode=reliable produce
    bit-identical ranks to the default local mode, and the reliable
    runs actually write to the configured checkpoint dir."""
    import os

    edges = [(i, (i * 3 + 1) % 11) for i in range(11)] + [(0, 5), (7, 2)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    want = {r["node"]: r["rank"] for r in graph.pagerank(df, iters=4).collect()}

    monkeypatch.setenv("CHILLASTIC_CHECKPOINT_DIR", str(tmp_path / "ckpt"))
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    for mode in ("disk", "reliable"):
        monkeypatch.setenv("CHILLASTIC_PERSIST", mode)
        got = {
            r["node"]: r["rank"] for r in graph.pagerank(df, iters=4).collect()
        }
        assert got == want, mode
    assert any(os.scandir(str(tmp_path / "ckpt")))  # reliable wrote state


def test_persist_mode_validation(monkeypatch):
    from chillastic_spark.persist import persist_mode

    monkeypatch.setenv("CHILLASTIC_PERSIST", "bogus")
    try:
        persist_mode()
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    monkeypatch.setenv("CHILLASTIC_PERSIST", "reliable")
    assert persist_mode() == "reliable"
    # back-compat alias honoured when the primary knob is unset
    monkeypatch.delenv("CHILLASTIC_PERSIST")
    monkeypatch.setenv("CHILLASTIC_DEDUP_PERSIST", "disk")
    assert persist_mode() == "disk"
