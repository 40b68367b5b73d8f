"""The r10/r11 PQ speedups must not move a single code or centroid:
the matmul-form assignment (||c||^2 - 2 x.c argmin) and the r11
vectorized centroid update (np.add.at group sums — sequential
accumulation in original row order, the same order and pairing as
numpy's axis-0 grouped mean for dsub > 1; the dsub == 1 configuration
keeps the grouped-mean loop because a 1-D mean switches to pairwise
summation) must reproduce the textbook broadcast-subtract k-means
BIT-EXACTLY on real corpus data. This pins that contract against
future edits."""
import numpy as np
import pyspark.sql.functions as F

from chillastic_spark import functions as CF
from chillastic_spark.operators.similarity import (
    _majority_dim,
    _train_sample,
    _unit_rows,
    pq_encode,
    pq_train_codebooks,
)
from chillastic_spark.tables import load

SF = "/root/testdata/sf0.01"


def _reference_train(X, m, k, iters):
    """The pre-r10 textbook implementation, verbatim."""
    dim = X.shape[1]
    dsub = dim // m
    books = np.zeros((m, min(k, len(X)), dsub))
    for j in range(m):
        Xj = X[:, j * dsub : (j + 1) * dsub]
        C = Xj[: books.shape[1]].copy()
        for _ in range(iters):
            d2 = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(C)):
                members = Xj[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j] = C
    return books


def test_codebooks_bit_identical_to_reference(spark):
    e = load(spark, SF, "embeddings")
    rows = _train_sample(e, 512, "vec_id", "embedding")
    dim = _majority_dim((r["_v"] for r in rows), stage="test")
    X = _unit_rows(
        np.array([r["_v"] for r in rows if len(r["_v"]) == dim], dtype=np.float64)
    )
    want = _reference_train(X, m=16, k=256, iters=8)
    got = pq_train_codebooks(e, m=16, k=256, iters=8, sample=512)
    assert np.array_equal(want, got)


def test_codebooks_bit_identical_to_reference_dsub1(spark):
    """m == dim → dsub == 1: the one configuration where the
    vectorized add.at update would NOT match (1-D pairwise mean), so
    the trainer keeps the grouped-mean loop there — pinned against the
    same verbatim reference."""
    e = load(spark, SF, "embeddings")
    rows = _train_sample(e, 256, "vec_id", "embedding")
    dim = _majority_dim((r["_v"] for r in rows), stage="test")
    X = _unit_rows(
        np.array([r["_v"] for r in rows if len(r["_v"]) == dim], dtype=np.float64)
    )
    want = _reference_train(X, m=dim, k=16, iters=4)
    got = pq_train_codebooks(e, m=dim, k=16, iters=4, sample=256)
    assert np.array_equal(want, got)


def test_codes_bit_identical_to_reference_argmin(spark):
    e = load(spark, SF, "embeddings").limit(300)
    books = pq_train_codebooks(e, m=16, k=256, iters=3, sample=256)
    B = np.asarray(books, dtype=np.float64)
    m, _, dsub = B.shape
    vecs = {
        r["vec_id"]: np.array(r["v"], dtype=np.float64)
        for r in e.select(
            "vec_id", CF.as_double_array("embedding").alias("v")
        ).collect()
    }
    got = {
        r["neighbor_id"]: list(r["code"])
        for r in pq_encode(
            e.select(F.col("vec_id").alias("neighbor_id"), "embedding"), books
        ).collect()
    }
    assert len(got) == len(vecs)
    for vid, v in vecs.items():
        n = np.linalg.norm(v)
        u = v / n if n else v
        want = [
            int(
                ((u[j * dsub : (j + 1) * dsub][None, :] - B[j]) ** 2)
                .sum(axis=1)
                .argmin()
            )
            for j in range(m)
        ]
        assert got[vid] == want, vid


def test_shared_sample_rows_match_per_trainer_collect(spark):
    """ivf_pq_topk hands ONE collected sample to both trainers; the
    books must equal a fresh per-trainer collect (same draw rule)."""
    e = load(spark, SF, "embeddings")
    rows = _train_sample(e, 512, "vec_id", "embedding")
    a = pq_train_codebooks(e, m=8, k=16, iters=3, sample=512)
    b = pq_train_codebooks(
        e, m=8, k=16, iters=3, sample=512, sample_rows=rows
    )
    assert np.array_equal(a, b)
