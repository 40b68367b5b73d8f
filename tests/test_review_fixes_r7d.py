"""Regression tests for the round-7 dedup/similarity review sweep:
dirty-row handling in the ANN paths, NULL-safe centroid outliers,
simhash's empty-doc contract, and the exact_dedup reserved-column
guard."""
import pytest
from pyspark.sql import functions as F

from chillastic_spark.operators import dedup as D
from chillastic_spark.operators import similarity as S


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], "a"),
        (1, [0.9, 0.1, 0.0], "a"),
        (2, [0.0, 1.0, 0.0], "a"),
        (3, [0.0, 0.9, 0.1], "b"),
        (4, [0.1, 0.0, 1.0], "b"),
        (None, [1.0, 0.0, 0.0], "a"),   # NULL id
        (6, None, "a"),                  # NULL vector
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )


def test_brute_force_twins_agree_on_dirty_rows(spark):
    """NULL-id corpus rows crashed the fast path's Arrow long cast (or
    emitted phantom NULL neighbors); NULL-embedding rows padded the
    slow path's top-k with NULL-cos junk. Both twins must drop them
    and agree row-for-row."""
    v = _vecs(spark)
    q = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0])], "query_id long, embedding array<double>"
    )
    slow = {(r["query_id"], r["neighbor_id"], r["cos"])
            for r in S.brute_force_topk(v, q, k=10).collect()}
    fast = {(r["query_id"], r["neighbor_id"], r["cos"])
            for r in S.brute_force_topk_fast(v, q, k=10).collect()}
    assert slow == fast
    ids = {n for _, n, _ in slow}
    assert None not in ids and 6 not in ids  # dirty rows dropped
    assert ids == {1, 2, 3, 4}  # every clean non-query row scored


def test_centroid_outliers_includes_null_label_group_and_drops_poison(spark):
    """NULL labels form their own group (null-safe joins) instead of
    being silently exempted; arrays CONTAINING a NULL element are
    excluded up front instead of biasing the group cutoff."""
    import random

    random.seed(7)
    rows = []
    for lab in ("a", None):
        for i in range(12):
            base = [1.0, 0.0] if lab == "a" else [0.0, 1.0]
            rows.append((
                (0 if lab == "a" else 100) + i,
                [base[0] + random.uniform(-0.05, 0.05),
                 base[1] + random.uniform(-0.05, 0.05)],
                lab,
            ))
    # one far outlier per group + one NULL-element poison row
    rows.append((50, [-1.0, 0.0], "a"))
    rows.append((150, [0.0, -1.0], None))
    rows.append((60, [0.5, None], "a"))
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = {r["vec_id"]: r for r in S.centroid_outliers(d, pct=0.1).collect()}
    assert 50 in out and out[50]["label"] == "a"
    assert 150 in out and out[150]["label"] is None  # NULL group scored
    assert 60 not in out  # poison row excluded, not silently unflaggable
    # and the poison row did not bias group a's cutoff to NULL/zero
    assert out[50]["cutoff"] is not None


def test_simhash_empty_docs_read_zero_and_never_pair(spark):
    """Empty/whitespace/NULL-text docs keep an id-complete simhash row
    of 0 (the '' phantom token used to give them ALL one identical
    non-zero fingerprint), and pair generation excludes them — n blank
    docs used to emit O(n^2) identical-hash pairs."""
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, ""),
        (4, "   "),
        (5, None),
        (6, "totally different words entirely here now"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(d).collect()}
    assert set(sh) == {1, 2, 3, 4, 5, 6}  # id-complete
    assert sh[3] == sh[4] == sh[5] == 0
    assert sh[1] == sh[2] != 0
    pairs = {(r["id_a"], r["id_b"]) for r in D.simhash_pairs(d).collect()}
    assert (1, 2) in pairs
    # no pair touches a token-less doc
    assert all(a not in (3, 4, 5) and b not in (3, 4, 5) for a, b in pairs)


def test_exact_dedup_rejects_reserved_rn_column(spark):
    d = spark.createDataFrame(
        [(1, "x", 9)], "doc_id long, text string, __rn int"
    )
    with pytest.raises(ValueError, match="__rn"):
        D.exact_dedup(d)
