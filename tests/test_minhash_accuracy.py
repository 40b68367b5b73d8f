"""MinHash estimator accuracy: for constructed doc pairs spanning the
overlap spectrum, the 64-perm signature agreement must track the EXACT
n-gram Jaccard within ~4σ of the binomial error (σ = √(J(1−J)/64) ≤
0.0625), and the estimate must be monotone-ish in true overlap."""
from pyspark.sql import functions as F

from chillastic_spark.operators import dedup as D


def _pair_corpus(spark):
    """Doc pairs (2i, 2i+1) sharing a controlled prefix: overlap grows
    with i. Words are pair-unique so no cross-pair collisions."""
    rows = []
    total = 40  # words per doc
    for i, shared in enumerate(range(0, 41, 5)):
        a = [f"p{i}s{k}" for k in range(shared)] + [f"p{i}a{k}" for k in range(total - shared)]
        b = [f"p{i}s{k}" for k in range(shared)] + [f"p{i}b{k}" for k in range(total - shared)]
        rows.append((2 * i, " ".join(a)))
        rows.append((2 * i + 1, " ".join(b)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_estimate_tracks_exact_jaccard(spark):
    docs = _pair_corpus(spark)
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, threshold=0.001).collect()
    }
    sigs = {
        r["doc_id"]: [r[f"mh{i}"] for i in range(64)]
        for r in D.minhash_signatures_wide(docs, num_perm=64).collect()
    }
    checked = 0
    for (ia, ib), true_j in exact.items():
        if ia // 2 != ib // 2:
            continue  # only constructed pairs
        est = sum(x == y for x, y in zip(sigs[ia], sigs[ib])) / 64.0
        assert abs(est - true_j) <= 0.25, (ia, ib, true_j, est)
        checked += 1
    assert checked >= 5  # the mid/high-overlap pairs all produced candidates
    # fully-disjoint pair: estimator must not hallucinate similarity
    lone = [(100, " ".join(f"x{k}" for k in range(40))),
            (101, " ".join(f"y{k}" for k in range(40)))]
    sigs2 = {
        r["doc_id"]: [r[f"mh{i}"] for i in range(64)]
        for r in D.minhash_signatures_wide(
            spark.createDataFrame(lone, "doc_id long, text string"), num_perm=64
        ).collect()
    }
    est0 = sum(x == y for x, y in zip(sigs2[100], sigs2[101])) / 64.0
    assert est0 <= 0.1
