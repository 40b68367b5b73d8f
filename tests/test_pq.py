"""Product-quantization tests: encoding determinism/shape, ADC score
fidelity, and recall vs the exact brute-force ranking."""
import numpy as np
import pyspark.sql.functions as F

from chillastic_spark.operators.similarity import (
    brute_force_topk,
    pq_encode,
    pq_topk,
    pq_train_codebooks,
)
from chillastic_spark.tables import load

SF = "/root/testdata/sf0.01"


def _queries(e):
    return e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_pq_codebooks_shape_and_determinism(spark):
    e = load(spark, SF, "embeddings")
    b1 = pq_train_codebooks(e, m=8, k=16, iters=3, sample=512)
    b2 = pq_train_codebooks(e, m=8, k=16, iters=3, sample=512)
    assert b1.shape == (8, 16, 8)
    assert np.array_equal(b1, b2)


def test_pq_encode_codes_in_range(spark):
    e = load(spark, SF, "embeddings").limit(100)
    books = pq_train_codebooks(e, m=8, k=16, iters=3, sample=256)
    enc = pq_encode(e.select(F.col("vec_id").alias("neighbor_id"), "embedding"), books)
    rows = enc.collect()
    assert len(rows) == 100
    for r in rows:
        assert len(r["code"]) == 8
        assert all(0 <= c < 16 for c in r["code"])


def test_pq_adc_matches_numpy_reconstruction(spark):
    """The JVM-side ADC fold must equal the numpy table-lookup distance
    for every (query, neighbor) pair."""
    e = load(spark, SF, "embeddings").limit(200)
    books = pq_train_codebooks(e, m=8, k=16, iters=3, sample=256)
    enc = {
        r["neighbor_id"]: list(r["code"])
        for r in pq_encode(
            e.select(F.col("vec_id").alias("neighbor_id"), "embedding"), books
        ).collect()
    }
    got = pq_topk(e, _queries(e), k=5, m=8, n_centroids=16, iters=3, sample=256).collect()
    qvecs = {
        r["query_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in _queries(e).collect()
    }
    for r in got:
        qv = qvecs[r["query_id"]]
        qv = qv / np.linalg.norm(qv)
        code = enc[r["neighbor_id"]]
        d2 = 0.0
        for j, c in enumerate(code):
            qj = qv[j * 8 : (j + 1) * 8]
            # the lut ships rounded to 9 decimals; mirror it
            d2 += round(float(((books[j][c] - qj) ** 2).sum()), 9)
        want = np.floor(d2 * 1e6 + 0.5) / 1e6
        assert abs(r["adc_d2"] - want) < 1e-9, (r["query_id"], r["neighbor_id"])


def test_pq_recall_vs_bruteforce(spark):
    e = load(spark, SF, "embeddings")
    q = _queries(e)
    exact = {}
    for r in brute_force_topk(e, q, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(**kw):
        approx = {}
        for r in pq_topk(e, q, k=10, **kw).collect():
            approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        assert set(approx) == set(exact)
        return sum(len(exact[i] & approx[i]) for i in exact) / (10 * len(exact))

    # pure compressed-domain scan: codes alone carry most of the signal
    assert recall(m=8, n_centroids=16) >= 0.25
    # the production shape (ADC shortlist + exact re-rank, the query
    # entry's config) recovers the true neighborhood
    assert recall(m=16, n_centroids=16, refine=5) >= 0.6
