"""Properties of the unigram-KL drift operator: partitioning cannot
change results (the rounded-DECIMAL-sum guarantee), and KL is
non-negative up to term rounding."""
from pyspark.sql import functions as F


def _kl(spark, docs):
    from chillastic_spark.operators import importance as IMP

    sb = IMP.unigram_counts(docs, "source")
    ref = sb.groupBy("bkt").agg(F.sum("ct").alias("cct"))
    return IMP.unigram_kl(sb, ref)


def test_kl_partitioning_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = {
        (r["source"], r["n_tokens"], r["kl"])
        for r in _kl(spark, docs).collect()
    }
    for n in (1, 7):
        got = {
            (r["source"], r["n_tokens"], r["kl"])
            for r in _kl(spark, docs.repartition(n)).collect()
        }
        assert got == base, f"repartition({n}) changed KL output"


def test_kl_nonnegative_and_zero_for_identical_distribution(spark):
    # a corpus where every source has the IDENTICAL token multiset:
    # P equals Q exactly (same proportions, same smoothing shares per
    # bucket) only when n_tokens == tot; here sources differ from the
    # pooled reference only by total mass, so KL stays tiny but >= 0
    rows = [(i, "alpha beta gamma alpha", f"s{i % 2}") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = _kl(spark, docs).collect()
    assert len(out) == 2
    p = 10 ** 9
    for r in out:
        assert r["kl"] >= -len(out) / p  # >= 0 up to per-term rounding


def test_kl_independent_of_co_batched_sources(spark):
    """A source's drift score depends only on its own data and the
    frozen reference — co-batching with a drifting source whose novel
    vocabulary would widen a batch-wide domain must not move it."""
    from pyspark.sql import functions as F

    from chillastic_spark.operators import importance as IMP

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = (
        IMP.unigram_counts(corpus, "source")
        .groupBy("bkt")
        .agg(F.sum("ct").alias("cct"))
    )
    a = corpus.filter(F.col("source") == "src1").limit(10)
    # a drifting co-arrival: novel tokens that hash outside most of the
    # reference's bucket set
    b = (
        a.withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", F.lit("xz7qq xz7qq wq9zz wq9zz vv3kk"))
        .withColumn("source", F.lit("src-novel"))
    )

    def kl_of(df):
        sb = IMP.unigram_counts(df, "source")
        return {
            r["source"]: r["kl"] for r in IMP.unigram_kl(sb, ref).collect()
        }

    alone = kl_of(a)
    co = kl_of(a.unionByName(b))
    assert alone["src1"] == co["src1"]
    assert co["src-novel"] >= 0.0


def test_combined_drift_matches_single_metric_functions(spark):
    from chillastic_spark.operators import importance as IMP

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sb = IMP.unigram_counts(docs, "source")
    ref = sb.groupBy("bkt").agg(F.sum("ct").alias("cct"))
    both = {
        r["source"]: (r["n_tokens"], r["kl"], r["psi"])
        for r in IMP.unigram_drift(sb, ref).collect()
    }
    kl = {r["source"]: r["kl"] for r in IMP.unigram_kl(sb, ref).collect()}
    psi = {r["source"]: r["psi"] for r in IMP.unigram_psi(sb, ref).collect()}
    assert {s: v[1] for s, v in both.items()} == kl
    assert {s: v[2] for s, v in both.items()} == psi
