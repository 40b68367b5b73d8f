"""Batch 19 — model-based corpus filters (operators/lm.py): hashed
bigram-LM perplexity scoring and a fastText-style hashed linear
quality classifier. These close the model-based-filtering family of
the LLM curation surface (heuristic gates: documents.py/analytics9;
importance weighting: analytics8 DSIR; this batch: LM scoring).

Both are exactly oracle-checked at sf0.001 and sf0.01 — the
transcendental terms (ln, exp) are rounded at 6 digits and
DECIMAL-summed on both engines (the DSIR determinism recipe).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chillastic_spark.operators import lm
from chillastic_spark.queries import Query
from chillastic_spark.tables import load

NLL_KEEP_MAX = 10.5  # keep docs whose mean bigram nll is at most this


def perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filter: per-doc mean negative
    log-likelihood under an add-1-smoothed hashed bigram LM trained on
    the corpus itself, plus the keep verdict at a fixed nll threshold
    (ppl = e^nll is monotone, so thresholding nll avoids cross-engine
    exp). Model tables are bounded by the hash bucket domain and
    broadcast — corpus size only affects the narrow scans."""
    d = load(spark, sf_dir, "documents")
    scored = lm.hashed_bigram_nll(d)
    return scored.select(
        "doc_id",
        "n_bigrams",
        "nll",
        (F.col("nll").isNotNull() & (F.col("nll") <= NLL_KEEP_MAX)).alias("keep"),
    )


PERPLEXITY_SQL = f"""
WITH base AS ({lm.bigram_nll_sql()})
SELECT doc_id, n_bigrams, nll,
  (nll IS NOT NULL AND nll <= {NLL_KEEP_MAX}) AS keep
FROM base
"""


def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality classifier over hashed
    bag-of-words features: margin = mean feature weight, prob =
    sigmoid(margin). Weights here are the deterministic pseudo-model
    (operators/lm._pseudo_weight) so the full scoring path runs and
    hash-checks without shipping a trained model; a real (bucket, w)
    table drops in with the same plan."""
    d = load(spark, sf_dir, "documents")
    return lm.linear_quality_scores(d)


QUALITY_CLASSIFIER_SQL = lm.linear_quality_sql()


def bpe_trained_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): one
    corpus pass builds the word-frequency table, then every merge
    round runs on the bounded vocab only. Rows-only entry — the
    iterative argmax loop is not SQL-expressible; determinism and
    merge-for-merge parity with a pure-Python replay are pinned in
    tests/test_bpe.py."""
    from chillastic_spark.operators import bpe

    d = load(spark, sf_dir, "documents")
    merges = bpe.train_bpe(d, n_merges=10)
    return spark.createDataFrame(
        [(i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank: int, left: string, right: string, merged: string",
    )


QUERIES = {
    "perplexity_filter": Query(perplexity_filter, PERPLEXITY_SQL),
    "quality_classifier_scores": Query(
        quality_classifier_scores, QUALITY_CLASSIFIER_SQL
    ),
    "bpe_trained_merges": Query(bpe_trained_merges, None),
}
