"""Property-based check of the as-of join against a brute-force
Python reference over random inputs."""
from hypothesis import given, settings, strategies as st

small_ints = st.integers(min_value=0, max_value=30)

left_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), small_ints),
    min_size=1, max_size=12, unique=True,
)
right_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), small_ints, st.integers(0, 99)),
    min_size=0, max_size=12,
    unique_by=lambda t: (t[0], t[1]),  # one right row per (key, ts)
)


def brute_force(left, right, strict):
    out = {}
    for k, ts in left:
        best = None
        for rk, rts, v in right:
            if rk != k:
                continue
            ok = rts < ts if strict else rts <= ts
            if ok and (best is None or rts > best[0]):
                best = (rts, v)
        out[(k, ts)] = best[1] if best else None
    return out


@settings(max_examples=25, deadline=None)
@given(left=left_strategy, right=right_strategy, strict=st.booleans())
def test_asof_matches_brute_force(spark, left, right, strict):
    from chillastic_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(left, "k: string, ts: long")
    rdf = spark.createDataFrame(
        right or [("zzz", -1, 0)], "k: string, ts: long, v: long"
    )
    got = {
        (r["k"], r["ts"]): r["v"]
        for r in asof_join(ldf, rdf, key="k", ts="ts", value_cols=["v"],
                           strict=strict).collect()
    }
    assert got == brute_force(left, right or [], strict)


def test_strict_excludes_equal_ts_even_with_tiebreak(spark):
    """Regression: a user tiebreak sorted before __side let right rows
    (NULL tiebreak, nulls-first) precede left rows at equal
    timestamps, silently re-including the matches strict excludes."""
    from chillastic_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10, 5)], "key string, ts long, seq long")
    right = spark.createDataFrame([("k", 10, 99), ("k", 9, 7)],
                                  "key string, ts long, v long")
    r = asof_join(left, right, "key", "ts", ["v"],
                  strict=True, order_tiebreak="seq").collect()
    assert r[0]["v"] == 7  # the ts=9 row, never the equal-ts 99


def test_duplicate_right_rows_carry_deterministic_winner(spark):
    """Two right rows at the same (key, ts): the carried value must not
    depend on shuffle order — the value-struct hash picks one winner."""
    from chillastic_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10)], "key string, ts long")
    right = spark.createDataFrame([("k", 10, 1), ("k", 10, 2)],
                                  "key string, ts long, v long")
    seen = {
        asof_join(left.repartition(p), right.repartition(p + 2),
                  "key", "ts", ["v"]).collect()[0]["v"]
        for p in (1, 3, 7)
    }
    assert len(seen) == 1, seen


def test_null_keys_never_match(spark):
    """Review finding: Window.partitionBy groups NULL keys together, so
    NULL-key left rows matched NULL-key right rows — diverging from
    every SQL/ASOF equi-join. NULL keys must carry NULL values."""
    from chillastic_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(None, 10), ("k", 10)], "key string, ts long"
    )
    right = spark.createDataFrame(
        [(None, 5, 111), ("k", 5, 7)], "key string, ts long, v long"
    )
    got = {r["key"]: r["v"] for r in asof_join(left, right, "key", "ts", ["v"]).collect()}
    assert got == {None: None, "k": 7}


def test_right_side_tiebreak_picks_among_duplicate_right_rows(spark):
    """Review finding: rt dropped the tiebreak column, so order_tiebreak
    could never do its one job. A right-side tiebreak now picks the
    max-tiebreak row among duplicates at the same (key, ts), ahead of
    the hash fallback; a column on neither side raises."""
    import pytest as _pytest

    from chillastic_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10)], "key string, ts long")
    right = spark.createDataFrame(
        [("k", 10, 1, 2), ("k", 10, 2, 1)], "key string, ts long, v long, seq long"
    )
    r = asof_join(left, right, "key", "ts", ["v"], order_tiebreak="seq").collect()
    assert r[0]["v"] == 1  # the seq=2 row wins (ascending -> last)

    with _pytest.raises(ValueError, match="neither side"):
        asof_join(left, right, "key", "ts", ["v"], order_tiebreak="nope")
