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
    df = spark.createDataFrame([(1, "alpha beta")], "doc_id: long, text: string")
    weights = spark.createDataFrame([(0, 5.0)], "bucket: long, w: double")
    r = lm.linear_quality_scores(df, weights=weights).collect()[0]
    # almost surely neither token hashes to bucket 0 → margin 0, prob .5
    if r["margin"] == 0.0:
        assert r["prob"] == 0.5 and r["keep"]


def test_classifier_keep_consistent_with_margin(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = lm.linear_quality_scores(df).collect()
    assert len(rows) == 500
    for r in rows:
        assert r["keep"] == (r["margin"] >= 0)
        assert 0.0 <= r["prob"] <= 1.0
