"""Regression tests for the round-6 deep operator review:

1. asof_join carried NULL-timestamp right rows as matches at -infinity
   (NULLS-FIRST ordering put them before every left row).
2. exact_dedup's keeper-id semi-join kept every row bearing the keeper
   id — byte-identical rows re-emitted under the same id survived; it
   also silently overwrote a caller's __fp column.
3. salted_join accepted salt_buckets <= 0: REMAINDER_BY_ZERO mid-job
   under ANSI, silent empty/unmatched join output without.
4. train_bpe pinned a vocab checkpoint per merge round and never
   released the previous one — storage grew with round count.
"""
import pytest
from pyspark.sql import functions as F


def test_asof_join_ignores_null_ts_right_rows(spark):
    from chillastic_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10)], "key string, ts long")
    right = spark.createDataFrame(
        [("k", None, 99), ("k", 5, 7)],
        "key string, ts long, v long",
    )
    for strict in (False, True):
        got = asof_join(left, right, "key", "ts", ["v"], strict=strict).collect()
        assert got[0].v == 7, (strict, got)  # never the NULL-ts row's 99
    # with ONLY a NULL-ts right row: no match at all
    right2 = spark.createDataFrame([("k", None, 99)], "key string, ts long, v long")
    got = asof_join(left, right2, "key", "ts", ["v"]).collect()
    assert got[0].v is None


def test_exact_dedup_collapses_same_id_duplicates(spark):
    from chillastic_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "same text"), (1, "same text"), (2, "same text"), (3, "other")],
        "doc_id long, text string",
    )
    out = exact_dedup(df).collect()
    assert sorted(r.doc_id for r in out) == [1, 3]  # ONE row per fingerprint


def test_exact_dedup_rejects_reserved_fp_column(spark):
    from chillastic_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame([(1, "t", "x")], "doc_id long, text string, __fp string")
    with pytest.raises(ValueError, match="__fp"):
        exact_dedup(df)


def test_salted_join_rejects_nonpositive_buckets(spark):
    from chillastic_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a")], "k long, x string")
    small = spark.createDataFrame([(1, "b")], "k long, y string")
    for bad in (0, -3):
        with pytest.raises(ValueError, match="salt_buckets"):
            salted_join(big, small, "k", salt_buckets=bad)


def test_train_bpe_releases_previous_round_pins(spark):
    """Persistent-RDD count must stay bounded (~2 live vocab tables),
    not grow by one per merge round."""
    from chillastic_spark.operators.bpe import train_bpe

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 3) for i in range(20)],
        "doc_id long, text string",
    )
    jsc_sc = spark.sparkContext._jsc.sc()
    before = jsc_sc.getPersistentRDDs().size()
    merges = train_bpe(docs, n_merges=8, batch_m=1)  # 8 rounds
    assert len(merges) >= 4
    after = jsc_sc.getPersistentRDDs().size()
    # one live vocab pin (plus transient scope noise) — NOT 8
    assert after - before <= 3, (before, after)
