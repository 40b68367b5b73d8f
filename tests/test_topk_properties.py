"""Property test: operators.topk must be observationally identical to
the global-window formulation it replaced, on arbitrary data including
duplicate scores, negative values, and ties."""
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chillastic_spark.operators.topk import last_of_topk, ranked_topk

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),  # id (dups collapse below)
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=0,
    max_size=40,
)


def _df(spark, rows):
    uniq = {}
    for i, s in rows:
        uniq.setdefault(i, s)  # one score per id (ranking key is (score, id))
    data = [(i, float(s)) for i, s in uniq.items()]
    return spark.createDataFrame(data, "id long, score double"), data


@settings(max_examples=25, deadline=None)
@given(rows=rows_strategy, k=st.integers(min_value=1, max_value=10))
def test_ranked_topk_matches_window_semantics(spark, rows, k):
    df, data = _df(spark, rows)
    got = [
        (r["rank"], r["id"], r["score"])
        for r in ranked_topk(df, "score", "id", k).collect()
    ]
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    want = [
        (r["rank"], r["id"], r["score"])
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    ]
    assert sorted(got) == sorted(want)


@settings(max_examples=15, deadline=None)
@given(rows=rows_strategy, k=st.integers(min_value=1, max_value=10))
def test_last_of_topk_matches_kth_row(spark, rows, k):
    df, data = _df(spark, rows)
    cur = last_of_topk(df, "score", "id", k).collect()[0]
    ordered = sorted(data, key=lambda t: (-t[1], t[0]))
    if not ordered:
        assert cur["cur_score"] is None and cur["cur_id"] is None
    else:
        want = ordered[min(k, len(ordered)) - 1]
        assert (cur["cur_id"], cur["cur_score"]) == (want[0], want[1])
