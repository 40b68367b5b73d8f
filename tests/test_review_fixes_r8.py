"""Regression tests for the round-8 review (ADVICE r7) and the new
unblocked embedding dedup:

1. knn_graph crashed on mixed-dimension corpora: off-width vectors do
   not get a NULL LSH bucket (the plan-time coefficient zip_with NULLs
   the projection and each bit's .otherwise(0) lands them in bucket 0),
   so a 3-dim vector sharing bucket 0 with 4-dim vectors made
   np.vstack raise ValueError inside the block-grid task and abort the
   job. Fixed by joining size(vec) to the block keys, exactly as
   embedding_dup_pairs does — cross-dimension pairs drop (the
   zip_with-fold cosine convention) and matrices stay rectangular.
"""
from pyspark.sql import functions as F


def test_knn_graph_survives_mixed_dimension_corpus(spark):
    from chillastic_spark.operators import similarity as S

    rows = [
        # 4-dim family: a tight pair + two orthogonal others
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        # 3-dim family: a tight pair — valid vectors, just a different
        # modality/model width than the rest of the corpus
        (10, [1.0, 0.0, 0.0]),
        (11, [0.95, 0.05, 0.0]),
        # degenerate rows the cleaners must drop
        (99, None),
        (98, [1.0, None, 0.0, 0.0]),
    ]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # planes=1 funnels everything into at most two buckets — before the
    # fix this configuration reproduced the ValueError crash
    edges = S.knn_graph(v, k=2, planes=1).collect()
    assert edges, "mixed-dim corpus must still produce a graph"
    by_src = {}
    for r in edges:
        by_src.setdefault(r.src, set()).add(r.dst)
    dims = {r[0]: len(r[1]) for r in rows if r[1] is not None and None not in r[1]}
    # cross-dimension pairs drop; NULL/NULL-element rows are not nodes
    for src, dsts in by_src.items():
        for dst in dsts:
            assert dims[src] == dims[dst], (src, dst)
    assert 99 not in by_src and 98 not in by_src
    # same-width neighbors are still found on both sides of the split
    assert 2 in by_src.get(1, set())
    assert 11 in by_src.get(10, set())


def test_knn_graph_mixed_dims_does_not_perturb_majority_width(spark):
    """Adding _dim to the block keys may not change same-width scoring:
    the plan-time width (taken from the first row) is 4 in both runs,
    so 4-dim bucket ids are identical, and the 3-dim intruders can only
    ever land in foreign buckets — never in a 4-dim numpy block. The
    mixed run's 4-dim edge component must therefore equal the
    4-dim-only run exactly. (The 3-dim subset alone is NOT comparable —
    solo it gets a genuine 3-wide plane matrix instead of the NULL
    projection's bucket 0 — so only the majority width is asserted.)"""
    from chillastic_spark.operators import similarity as S

    four = [(i, [float(i == j) for j in range(4)]) for i in range(1, 5)]
    four += [(5, [0.8, 0.2, 0.0, 0.0]), (6, [0.7, 0.3, 0.0, 0.0])]
    three = [(20 + i, [float(i == j) for j in range(3)]) for i in range(3)]
    three += [(25, [0.9, 0.1, 0.0])]
    schema = "vec_id long, embedding array<double>"

    def edge_set(rows, keep_ids=None):
        df = spark.createDataFrame(rows, schema)
        return {
            (r.src, r.dst, r.cos)
            for r in S.knn_graph(df, k=3, planes=1).collect()
            if keep_ids is None or r.src in keep_ids
        }

    four_ids = {r[0] for r in four}
    assert edge_set(four + three, four_ids) == edge_set(four)


def test_embedding_dup_pairs_unblocked_finds_planted_dups(spark):
    """Planted near-identical pairs must surface without any blocking
    column; emitted cosines are exact; dirty rows (NULL id, NULL
    vector, NULL element, off-width) never pair; each pair emits once
    despite multi-table/multi-probe candidate overlap."""
    import numpy as np

    from chillastic_spark.operators.dedup import embedding_dup_pairs_unblocked

    rng_rows = []
    # deterministic pseudo-random base vectors (no np.random state
    # dependence across runs: fixed seed)
    rng = np.random.RandomState(7)
    base = rng.randn(20, 8)
    for i, v in enumerate(base):
        rng_rows.append((i, [float(x) for x in v]))
    # planted near-dups: tiny perturbations of rows 0 and 1
    rng_rows.append((100, [float(x) for x in base[0] + 1e-3]))
    rng_rows.append((101, [float(x) for x in base[1] * 1.0001]))
    # dirty rows
    rng_rows += [(900, None), (901, [1.0, None, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
                 (None, [float(x) for x in base[2]]), (902, [1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rng_rows, "vec_id long, embedding array<double>")
    got = embedding_dup_pairs_unblocked(
        df, threshold=0.99, planes=2, probes=2, tables=4
    ).collect()
    pairs = {(r.id_a, r.id_b): r.cos for r in got}
    assert len(pairs) == len(got), "a pair was emitted more than once"
    assert (0, 100) in pairs and (1, 101) in pairs
    for (a, b), cos in pairs.items():
        assert a is not None and b is not None and a < b
        assert a not in (900, 901) and b not in (900, 901)
        assert cos >= 0.99
    # exact cosine for a planted pair (independent recompute)
    va, vb = np.array(base[0]), np.array(base[0] + 1e-3)
    want = float(np.floor(
        va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)) * 10000 + 0.5
    ) / 10000)
    assert pairs[(0, 100)] == want


def test_ann_surface_survives_mixed_dimension_corpus(spark, tmp_path):
    """The whole ANN serving family on a mixed-width corpus + mixed-
    width queries: no ragged-np.array crash anywhere, cross-dimension
    pairs drop everywhere (the zip_with-fold convention), quantizers
    train on the majority width, and the served vector index stays
    bit-identical to scan-time lsh_topk."""
    from chillastic_spark.operators import similarity as S
    from chillastic_spark.sources.vector_index import (
        ann_query_index,
        build_vector_index,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.5, 0.5, 0.0, 0.0]),
        (10, [1.0, 0.0, 0.0]),
        (11, [0.95, 0.05, 0.0]),
        (99, None),
        (98, [1.0, None, 0.0, 0.0]),
    ]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (10, [1.0, 0.0, 0.0]),
         (77, [1.0, 0.0, 0.0, 0.0, 0.0]), (78, [1.0, None, 0.0, 0.0])],
        "query_id long, embedding array<double>",
    )
    dims = {r[0]: len(r[1]) for r in rows if r[1] is not None and None not in r[1]}

    def check(df, exact_widths):
        got = df.collect()
        for r in got:
            assert r.neighbor_id not in (98, 99)
            assert r.cos is not None or hasattr(r, "adc_d2")
            if exact_widths:
                assert dims[r.neighbor_id] == (4 if r.query_id == 1 else 3)
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
        assert 77 not in by_q and 78 not in by_q  # off-width/dirty queries
        return by_q

    # exact: BOTH widths served, each within its width
    bq = check(S.brute_force_topk_fast(v, qs, k=3), exact_widths=True)
    assert 2 in bq[1] and 11 in bq[10]
    # LSH: no NULL-cos edges, no cross-width pairs
    lsh = S.lsh_topk(v, qs, k=3, planes=2, probes=2)
    for r in lsh.collect():
        assert r.cos is not None and dims[r.neighbor_id] == dims[r.query_id]
    # IVF/PQ: majority width (4) is the trained geometry; the 3-wide
    # query scores nothing instead of crashing the lut/probe math
    ivf = check(S.ivf_topk(v, qs, k=3, n_cells=2), exact_widths=False)
    assert 10 not in ivf and all(dims[n] == 4 for n in ivf.get(1, set()))
    pq = S.pq_topk(v, qs, k=3, m=2, n_centroids=4).collect()
    assert all(r.neighbor_id not in (98, 99, 10, 11) for r in pq)
    assert {r.query_id for r in pq} == {1}
    # served index == scan-time operator on the same mixed corpus
    idx = str(tmp_path / "vidx_mixed")
    build_vector_index(v, idx, planes=2)
    got = {
        (r.query_id, r.neighbor_id, r.cos)
        for r in ann_query_index(spark, idx, qs, k=3, probes=2).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.cos)
        for r in S.lsh_topk(v, qs, k=3, planes=2, probes=2).collect()
    }
    assert got == want and want


def test_ivf_pq_topk_exhaustive_probe_equals_brute_force(spark):
    """Structural exactness anchor for the IVF-PQ composite: probing
    EVERY cell with a shortlist wider than the corpus makes the ADC
    stage pure candidate generation, so the exact re-rank must equal
    brute force bit-for-bit. Dirty rows (NULL id/vector/element,
    off-width) stay excluded; an m that doesn't divide the width
    raises instead of producing garbage LUT math."""
    import numpy as np
    import pytest
    from chillastic_spark.operators import similarity as S

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(30)]
    rows += [(900, None), (901, [1.0, None] + [0.0] * 6), (902, [1.0, 0.0, 0.0])]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, rows[0][1]), (1, rows[1][1]), (70, [1.0, 0.0, 0.0])],
        "query_id long, embedding array<double>",
    )
    got = {
        (r.query_id, r.neighbor_id, r.cos)
        for r in S.ivf_pq_topk(
            v, q, k=5, n_cells=4, nprobe=4, m=4, n_centroids=16, refine=20
        ).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.cos)
        for r in S.brute_force_topk_fast(v, q, k=5).collect()
        # brute force scores the 3-wide query against the 3-wide corpus
        # row; ivf-pq's single trained geometry (majority width 8)
        # cannot — restrict the anchor to the trained width
        if r.query_id != 70
    }
    assert {t for t in got if t[0] != 70} == want and want
    assert not {t for t in got if t[0] == 70}
    for _, nid, _ in got:
        assert nid not in (900, 901, 902)
    with pytest.raises(ValueError, match="divisible|dim"):
        S.ivf_pq_topk(v, q, k=5, n_cells=4, nprobe=2, m=3, n_centroids=16)


def test_embedding_dup_incremental_bipartite_grid(spark):
    """The incremental embedding dedup under a FORCED multi-block
    bipartite grid (block_size=4): exactly-once pair emission across
    the fan-out, incoming x incoming never pairs, incoming-only or
    existing-only (group, width) slices score nothing, dirty rows
    drop, and every emitted cosine matches an independent recompute."""
    import numpy as np

    from chillastic_spark.operators.dedup import embedding_dup_incremental
    from pyspark.sql import functions as F

    rng = np.random.RandomState(3)
    rows = []
    vecs = {}
    # 20 existing + 10 incoming in one label, 8-dim
    for i in range(20):
        vecs[i] = rng.randn(8)
        rows.append((i, "a", [float(x) for x in vecs[i]], False))
    for i in range(100, 110):
        # each incoming vector is a near-copy of existing i-100
        vecs[i] = vecs[i - 100] + 1e-3
        rows.append((i, "a", [float(x) for x in vecs[i]], True))
    # incoming-only width (3-dim) and existing-only label
    rows.append((200, "a", [1.0, 0.0, 0.0], True))
    rows.append((201, "b", [1.0] * 8, False))
    # dirty
    rows.append((900, "a", None, True))
    rows.append((901, "a", [1.0, None, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], False))
    rows.append((None, "a", [float(x) for x in vecs[0]], True))
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>, inc boolean"
    )
    got = embedding_dup_incremental(
        df, F.col("inc"), threshold=0.99, block_size=4
    ).collect()
    pairs = {(r.vec_id, r.match_id): r.cos for r in got}
    assert len(pairs) == len(got), "a pair was emitted more than once"
    inc_ids = {i for i in range(100, 110)} | {200, 900}
    for (vi, me), cos in pairs.items():
        assert vi in inc_ids and me not in inc_ids, (vi, me)
        assert vi not in (900, None) and me not in (901, 201)
        a, b = vecs[vi], vecs[me]
        want = float(np.floor(
            a @ b / (np.linalg.norm(a) * np.linalg.norm(b)) * 10000 + 0.5
        ) / 10000)
        assert cos == want and cos >= 0.99
    # every planted near-copy found its source
    for i in range(100, 110):
        assert (i, i - 100) in pairs
