"""Regression tests for the round-9 review (ADVICE r8):

1. Data-NaN convention unified: clean_vectors (and its DuckDB SQL
   twin) now drop NaN-element vectors, so the exact brute-force twin,
   the Arrow fast path, and the oracle can never disagree on a
   NaN-poisoned corpus (NaN sorts GREATEST in both engines, so a kept
   NaN row ranked FIRST in one twin and was dropped by the other).
2. embedding_dup_pairs_unblocked dedups multi-bucket pair emissions
   with groupBy max(cos), not dropDuplicates — each bucket recomputes
   the cosine in a different BLAS matmul shape, so the old arbitrary
   survivor was partition-nondeterministic at a 1e-4 bin edge.
3. semantic_decontaminate_flags reuses ONE benchmark-side broadcast
   per app (fingerprint-keyed) instead of leaking a fresh up-to-128MB
   broadcast per builder call.
4. Mixed-width corpora are VISIBLE: quantizer training logs the width
   histogram, and ivf_assign_cells / pq_encode count their silent
   drops into DROP_COUNTERS.
"""
import logging
import math

import pytest
from pyspark.sql import functions as F


NAN_ROWS = [
    (1, [1.0, 0.0, 0.0]),
    (2, [0.9, 0.1, 0.0]),
    (3, [0.0, 1.0, 0.0]),
    (7, [float("nan"), 1.0, 0.0]),  # data NaN — must be nobody's neighbor
    (8, None),
    (9, [1.0, None, 0.0]),
]


@pytest.fixture()
def nan_corpus(spark):
    return spark.createDataFrame(NAN_ROWS, "vec_id long, embedding array<double>")


def test_clean_vectors_drops_nan_rows(nan_corpus):
    from chillastic_spark.operators.similarity import clean_vectors

    kept = {r.vec_id for r in clean_vectors(nan_corpus).collect()}
    assert kept == {1, 2, 3}


def test_clean_vectors_sql_twin_agrees_on_nan(nan_corpus):
    import duckdb

    from chillastic_spark.operators.similarity import (
        CLEAN_VECTORS_SQL,
        clean_vectors,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE e (vec_id BIGINT, embedding DOUBLE[])")
    for vid, v in NAN_ROWS:
        con.execute("INSERT INTO e VALUES (?, ?)", [vid, v])
    gate = CLEAN_VECTORS_SQL.format(col="embedding")
    oracle = {r[0] for r in con.execute(f"SELECT vec_id FROM e WHERE {gate}").fetchall()}
    engine = {r.vec_id for r in clean_vectors(nan_corpus).collect()}
    assert oracle == engine == {1, 2, 3}


def test_exact_and_fast_topk_agree_on_nan_poisoned_corpus(spark, nan_corpus):
    from chillastic_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_fast,
    )

    q = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "query_id long, embedding array<double>"
    )
    exact = {
        (r.query_id, r.neighbor_id): r.cos
        for r in brute_force_topk(nan_corpus, q, k=10).collect()
    }
    fast = {
        (r.query_id, r.neighbor_id): r.cos
        for r in brute_force_topk_fast(nan_corpus, q, k=10).collect()
    }
    assert exact == fast
    assert not any(math.isnan(c) for c in exact.values())
    assert 7 not in {n for (_, n) in exact}


def test_unblocked_dedup_is_partition_deterministic(spark):
    """The same corpus under different input partitionings must emit
    the identical pair set AND identical cos values: multi-bucket
    emissions collapse via max(cos), removing the arbitrary-survivor
    dependence on task scheduling."""
    from chillastic_spark.operators.dedup import embedding_dup_pairs_unblocked

    rows = [
        (i, [1.0 + 0.001 * (i % 7), 0.5 * (i % 3), 0.25 * (i % 5), 1.0])
        for i in range(60)
    ]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    outs = []
    for parts in (1, 7):
        df = base.repartition(parts)
        outs.append(
            {
                (r.id_a, r.id_b): r.cos
                for r in embedding_dup_pairs_unblocked(
                    df, threshold=0.9, planes=2, probes=2, tables=3, block_size=8
                ).collect()
            }
        )
    assert outs[0] == outs[1]
    assert outs[0], "tight corpus must produce pairs"


def test_decontaminate_bench_broadcast_reused(spark):
    from chillastic_spark.queries import vectors as V

    V._SEM_BC_CACHE.clear()
    V.semantic_decontaminate_flags(spark, "/root/testdata/sf0.001")
    assert len(V._SEM_BC_CACHE) == 1
    (fp1, bc1) = next(iter(V._SEM_BC_CACHE.values()))
    V.semantic_decontaminate_flags(spark, "/root/testdata/sf0.001")
    assert len(V._SEM_BC_CACHE) == 1
    (fp2, bc2) = next(iter(V._SEM_BC_CACHE.values()))
    assert fp1 == fp2 and bc1 is bc2, "same bench side must reuse the broadcast"


def test_mixed_width_training_logs_histogram(spark, caplog):
    from chillastic_spark.operators import similarity as S

    rows = [(i, [1.0 * i, 0.5, 0.25, 1.0]) for i in range(6)] + [
        (100 + i, [1.0, 0.0]) for i in range(4)
    ]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with caplog.at_level(logging.WARNING, logger="chillastic_spark.similarity"):
        S.ivf_coarse_centroids(v, n_cells=2, iters=1)
    msgs = [r.message for r in caplog.records]
    assert any("mixed-width" in m and "width 4" in m for m in msgs), msgs


def test_assignment_drop_counter_counts_minority_width(spark):
    from chillastic_spark.operators import similarity as S

    rows = [(i, [1.0 * i, 0.5, 0.25, 1.0]) for i in range(6)] + [
        (100 + i, [1.0, 0.0]) for i in range(4)
    ]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = S.ivf_coarse_centroids(v, n_cells=2, iters=1)
    assigned = S.ivf_assign_cells(v, C)
    n = assigned.count()
    assert n == 6
    assert S.DROP_COUNTERS["ivf_assign_cells"].value == 4


def test_auto_cells_rule():
    """r8 verdict #4: IVF cells scale with the corpus (~512 rows/cell,
    clamped [4, 1024]) — the sweep showed no fixed count serves both a
    500-row and a 20k corpus."""
    from chillastic_spark.operators.similarity import _auto_cells

    assert _auto_cells(0) == 4
    assert _auto_cells(500) == 4
    assert _auto_cells(2000) == 4
    assert _auto_cells(20000) == 32
    assert _auto_cells(1_000_000) == 1024
    assert _auto_cells(10**9) == 1024


def test_auto_nprobe_rule():
    """nprobe defaults to max(3, cells/2) — the floor-holding scan
    fraction the HELD-OUT sweep forced (the contaminated first sweep
    claimed 0.88 recall at 9%; held-out queries measured 0.26)."""
    from chillastic_spark.operators.similarity import _auto_nprobe, resolve_nprobe

    assert _auto_nprobe(4) == 3
    assert _auto_nprobe(32) == 16
    assert _auto_nprobe(1024) == 512
    assert resolve_nprobe("auto", 4) == 3
    assert resolve_nprobe(8, 4) == 4  # capped at n_cells
    assert resolve_nprobe(2, 32) == 2  # explicit passes through


def test_ivf_auto_defaults_clear_raised_recall_floor(spark):
    """The registered ann_ivf_topk config (auto cells, auto nprobe,
    hash-spread 32-query sample) must clear the raised 0.8 twin floor
    on the driver corpus (the old fixed n_cells=8 measured 0.54)."""
    from chillastic_spark.operators.similarity import (
        brute_force_topk_fast,
        ivf_topk,
    )
    from chillastic_spark.queries.vectors import _ann_query_set
    from chillastic_spark.tables import load

    e = load(spark, "/root/testdata/sf0.01", "embeddings")
    q = _ann_query_set(e)
    want: dict = {}
    for r in brute_force_topk_fast(e, q, k=10).collect():
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict = {}
    for r in ivf_topk(e, q, k=10).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(want[k] & got.get(k, set())) for k in want)
    tot = sum(len(v) for v in want.values())
    assert hits / tot >= 0.8
