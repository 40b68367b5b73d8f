"""operators/lm.py: hashed bigram-LM perplexity + linear quality
classifier — signal direction, edge cases, injected weights, and the
broadcast plan shape."""
import pytest
from pyspark.sql import functions as F

from chillastic_spark.operators import lm

COMMON = "the quick brown fox jumps over the lazy dog again and again"


@pytest.fixture(scope="module")
def scored(spark):
    rows = [(i, COMMON) for i in range(1, 9)]  # the corpus's dominant idiom
    rows.append((100, "zyx wvu tsr qpo nml kji hgf edc"))  # unseen bigrams
    rows.append((101, "solo"))  # single token: no bigrams
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    return {r["doc_id"]: r for r in lm.hashed_bigram_nll(df).collect()}


def test_nll_separates_common_from_gibberish(scored):
    common_nll = scored[1]["nll"]
    gib_nll = scored[100]["nll"]
    assert common_nll is not None and gib_nll is not None
    # every bigram of doc 1 occurs 8+ times; doc 100's occur once each
    assert gib_nll > common_nll + 1.0


def test_nll_short_doc_is_null(scored):
    assert scored[101]["n_bigrams"] == 0 and scored[101]["nll"] is None


def test_nll_identical_docs_identical_scores(scored):
    assert len({scored[i]["nll"] for i in range(1, 9)}) == 1


def test_lm_model_tables_broadcast(spark):
    df = spark.createDataFrame(
        [(i, COMMON + f" tail{i}") for i in range(50)], "doc_id: long, text: string"
    )
    plan = lm.hashed_bigram_nll(df)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # both count-table joins must be broadcast: the model side is
    # bounded by the bucket domain at any corpus size. (The final
    # ids ⟕ scored join is corpus-sized on both sides — sort-merge is
    # correct THERE, so only inner joins are constrained.)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin Inner" not in plan


def test_classifier_injected_weights(spark):
    from chillastic_spark import functions as CF

    df = spark.createDataFrame(
        [(1, "good good good"), (2, "bad bad bad")], "doc_id: long, text: string"
    )
    bkt = lambda tok: (  # noqa: E731
        df.select((CF.hash60(F.concat(F.lit(tok), F.lit("#qc"))) % lm.QC_BUCKETS))
        .first()[0]
    )
    weights = spark.createDataFrame(
        [(bkt("good"), 2.0), (bkt("bad"), -2.0)], "bucket: long, w: double"
    )
    rows = {r["doc_id"]: r for r in
            lm.linear_quality_scores(df, weights=weights).collect()}
    assert rows[1]["margin"] == 2.0 and rows[1]["keep"]
    assert rows[2]["margin"] == -2.0 and not rows[2]["keep"]
    assert rows[1]["prob"] > 0.85 and rows[2]["prob"] < 0.15


def test_classifier_unknown_tokens_weight_zero(spark):
    from chillastic_spark import functions as CF

    df = spark.createDataFrame([(1, "alpha beta")], "doc_id: long, text: string")
    used = {
        r[0]
        for r in df.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
        )
        .select(CF.hash60(F.concat(F.col("tok"), F.lit("#qc"))) % lm.QC_BUCKETS)
        .collect()
    }
    # weight a bucket NEITHER token hashes to → every token unknown
    free = next(b for b in range(lm.QC_BUCKETS) if b not in used)
    weights = spark.createDataFrame([(free, 5.0)], "bucket: long, w: double")
    r = lm.linear_quality_scores(df, weights=weights).collect()[0]
    assert r["margin"] == 0.0 and r["prob"] == 0.5 and r["keep"]


def test_classifier_keep_consistent_with_margin(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = lm.linear_quality_scores(df).collect()
    assert len(rows) == 500
    for r in rows:
        assert r["keep"] == (r["margin"] >= 0)
        assert 0.0 <= r["prob"] <= 1.0


# --------------------------------------------------- streaming LM gate


def test_lm_filter_stream_matches_batch(spark, tmp_path):
    """Streaming perplexity flags (frozen corpus LM scoring micro-
    batched incoming docs) must equal the batch operator when the
    incoming docs ARE the training corpus — every bigram is then in
    the model, so the stream's left joins coincide with the batch
    inner joins and batching boundaries cannot change per-doc scores."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chillastic_spark.queries import all_queries
    from chillastic_spark.streaming import lm_filter_stream

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    incoming = corpus.toPandas()

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    n_files = 4
    step = max(1, len(incoming) // n_files)
    for i in range(n_files):
        chunk = (
            incoming.iloc[i * step :]
            if i == n_files - 1
            else incoming.iloc[i * step : (i + 1) * step]
        )
        if len(chunk):
            pq.write_table(
                pa.Table.from_pandas(chunk, preserve_index=False),
                str(stream_dir / f"part-{i:04d}.parquet"),
            )

    out_dir = str(tmp_path / "flags")
    q = lm_filter_stream(
        spark, str(stream_dir), corpus, out_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = {
        (r["doc_id"], r["n_bigrams"], r["nll"], r["keep"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["doc_id"], r["n_bigrams"], r["nll"], r["keep"])
        for r in all_queries()["perplexity_filter"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert got == want and len(want) == 500


def test_lm_filter_stream_unseen_bigrams_penalized(spark, tmp_path):
    """Docs whose bigrams the frozen model never saw must score the
    maximum smoothed nll (count 0 → 1/(0+buckets)) rather than error."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chillastic_spark.operators import lm
    from chillastic_spark.streaming import lm_filter_stream

    corpus = spark.createDataFrame(
        [(i, COMMON) for i in range(1, 20)], "doc_id: long, text: string"
    )
    inc = pa.Table.from_pydict(
        {"doc_id": [100], "text": ["zz yy xx ww vv uu"]}
    )
    stream_dir = tmp_path / "inc"
    stream_dir.mkdir()
    pq.write_table(inc, str(stream_dir / "part-0000.parquet"))

    out_dir = str(tmp_path / "flags")
    q = lm_filter_stream(
        spark, str(stream_dir), corpus, out_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    r = spark.read.parquet(out_dir).collect()[0]
    # all 5 bigrams unseen, contexts unseen: term = -ln(1 / buckets)
    expect = round(math.log(lm.LM_BUCKETS), 4)
    assert r["n_bigrams"] == 5
    assert abs(r["nll"] - expect) < 1e-3
    assert not r["keep"]


def test_dsir_null_target_counts_as_non_target(spark):
    """A NULL-evaluating target (lang IS NULL under lang=='en') must
    count as non-target like the SQL twin's CASE ELSE 0 — an
    un-coalesced NULL poisoned the bucket sum and NULLed the weight of
    every doc sharing the bucket."""
    import pyspark.sql.functions as F

    from chillastic_spark.operators.importance import dsir_weights

    docs = spark.createDataFrame(
        [("d1", None, "zzz zzz qqq"), ("d2", "en", "hello world")],
        "doc_id string, lang string, text string",
    )
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir_weights(docs, F.col("lang") == "en").collect()
    }
    assert got["d1"] is not None and got["d2"] is not None


def test_linear_quality_preserves_null_and_empty_text_docs(spark):
    """Review finding: NULL-text docs silently vanished from the
    classifier output (no keep row at all); empty-text docs were scored
    on the '' pseudo-token. Both now get explicit featureless reject
    rows, and keep/reject accounting sums to the input count."""
    df = spark.createDataFrame(
        [(1, COMMON), (2, None), (3, ""), (4, "   ")],
        "doc_id: long, text: string",
    )
    rows = {r["doc_id"]: r for r in lm.linear_quality_scores(df).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for d in (2, 3, 4):
        assert rows[d]["n_feats"] == 0
        assert rows[d]["margin"] is None and rows[d]["prob"] is None
        assert rows[d]["keep"] is False
    assert rows[1]["n_feats"] == len(COMMON.split())
    assert rows[1]["keep"] in (True, False)  # scored, not dropped


def test_lm_oracles_engine_exact_on_adversarial_frame(spark):
    """r7 reshape: both lm scorers now aggregate marker rows instead of
    rejoining the table (the dsir_weights convention). Pin cross-engine
    value-exactness on the frame the sf corpora can't produce: 1-token
    docs, NULL text, whitespace text, and duplicate ids whose tokens
    must pool into one group on BOTH engines."""
    import duckdb
    import pandas as pd

    from chillastic_spark.operators.lm import (
        bigram_nll_sql,
        hashed_bigram_nll,
        linear_quality_scores,
        linear_quality_sql,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "single"),           # 1 token: bigram-less but featured
        (3, None),               # NULL text
        (4, "   "),              # ws-only text
        (5, "first half here"),  # duplicate id: tokens pool
        (5, "second half there"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))

    got_nll = {
        r["doc_id"]: (r["n_bigrams"], r["nll"])
        for r in hashed_bigram_nll(d, buckets=64).collect()
    }
    want_nll = {
        r[0]: (r[1], r[2])
        for r in con.sql(bigram_nll_sql(buckets=64)).fetchall()
    }
    assert set(got_nll) == set(want_nll) == {1, 2, 3, 4, 5}
    for k in want_nll:
        assert got_nll[k][0] == want_nll[k][0], (k, got_nll[k], want_nll[k])
        if want_nll[k][1] is None:
            assert got_nll[k][1] is None, k
        else:
            assert abs(got_nll[k][1] - want_nll[k][1]) < 1e-12, k
    assert got_nll[2] == (0, None) and got_nll[3] == (0, None)
    assert got_nll[5][0] == 4  # both duplicate rows' bigrams pooled

    got_q = {
        r["doc_id"]: (r["n_feats"], r["margin"], r["prob"], r["keep"])
        for r in linear_quality_scores(d, buckets=64).collect()
    }
    want_q = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.sql(linear_quality_sql(buckets=64)).fetchall()
    }
    assert set(got_q) == set(want_q) == {1, 2, 3, 4, 5}
    for k in want_q:
        assert got_q[k][0] == want_q[k][0], (k, got_q[k], want_q[k])
        for i in (1, 2):
            if want_q[k][i] is None:
                assert got_q[k][i] is None, k
            else:
                assert abs(got_q[k][i] - want_q[k][i]) < 1e-12, k
        assert got_q[k][3] == want_q[k][3], k
    assert got_q[3][:2] == (0, None) and got_q[3][3] is False
    assert got_q[4][:2] == (0, None) and got_q[4][3] is False
    assert got_q[2][0] == 1          # the 1-token doc IS featured
    assert got_q[5][0] == 6          # duplicate rows' features pooled
