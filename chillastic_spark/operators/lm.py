"""Model-based corpus filters: hashed bigram-LM perplexity scoring
(the CCNet/LLaMA-pipeline "perplexity filter" shape, Wenzek et al.
2020 arXiv:1911.00359) and a hashed linear quality classifier (the
fastText-style "looks like curated text" gate of the GPT-3/LLaMA
data pipelines, Brown et al. 2020 §A / Touvron et al. 2023 §2).

Both follow the bounded-hashed-feature design of
``operators/importance.dsir_weights``: token features hash into a
fixed bucket domain, so the "model" is a ≤2^16-row table that
BROADCASTS — corpus size only affects the narrow token scans, never
the model side. Hash collisions are the standard accepted
approximation (documented in the DSIR paper for the same trick).

Cross-engine determinism: every transcendental term (log, exp) is
computed on the same arithmetic both engines see, rounded with
``round_det`` at 6 digits, and summed as DECIMAL — the exact recipe
the DSIR operator's oracle equality already proves out.

In production the classifier weights come from a trained model; the
default here derives deterministic pseudo-weights from the bucket id
(a Knuth multiplicative hash into [-1, 1]) so the full scoring path
is exercised and exactly oracle-checkable without shipping a model.
Pass ``weights`` (bucket, w) to use real ones — same plan shape.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chillastic_spark import functions as CF

LM_BUCKETS = 65536
QC_BUCKETS = 4096
NLL_DIGITS = 6


def _bigram_stream(
    df: DataFrame, id_col: str, text_col: str, buckets: int
) -> DataFrame:
    """(doc_id, pb, bb) per bigram occurrence: hashed buckets of the
    context token and of the bigram. Narrow (per-row array expansion);
    the words array is projected once so codegen doesn't re-tokenise
    per bigram (the ngrams_of_words caveat)."""
    base = df.select(
        F.col(id_col).alias("doc_id"), CF.words(text_col).alias("__w")
    )
    w = F.col("__w")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.struct(
            F.element_at(w, i).alias("prev"),
            F.concat(
                F.element_at(w, i), F.lit(" "), F.element_at(w, i + 1)
            ).alias("bigram"),
        ),
    )
    pairs = F.when(F.size(w) >= 2, pairs).otherwise(
        F.array().cast("array<struct<prev:string,bigram:string>>")
    )
    return base.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id",
        (CF.hash60(F.col("p.prev")) % buckets).alias("pb"),
        (CF.hash60(F.col("p.bigram")) % buckets).alias("bb"),
    )


def score_bigrams_against(
    grams: DataFrame,
    ctx: DataFrame,
    big: DataFrame,
    buckets: int,
    frozen: bool = False,
) -> DataFrame:
    """(doc_id, n_bigrams, nll) from a bigram-bucket stream scored
    against the two LM count tables — THE one definition of the
    nll-term rounding and DECIMAL summation, shared by
    ``hashed_bigram_nll`` (self-trained: inner joins, every bucket
    exists) and the streaming frozen-model path (``frozen=True``:
    left joins + count 0 for buckets unseen in the frozen corpus).
    A rounding or smoothing change here changes both scorers at once;
    duplicated, the streaming filter silently forks from the batch
    operator the composed pipeline is pinned against."""
    how = "left" if frozen else "inner"
    big_ct = (
        F.coalesce(F.col("big_ct"), F.lit(0)) if frozen else F.col("big_ct")
    )
    ctx_ct = (
        F.coalesce(F.col("ctx_ct"), F.lit(0)) if frozen else F.col("ctx_ct")
    )
    return (
        grams.join(F.broadcast(ctx), "pb", how)
        .join(F.broadcast(big), "bb", how)
        .withColumn(
            "nll_term",
            CF.round_det(
                -F.log((big_ct + 1) / (ctx_ct + F.lit(buckets))),
                NLL_DIGITS,
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.col("nll_term").cast("decimal(28,6)")).alias("__s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            CF.round_det(
                F.col("__s").cast("double") / F.col("n_bigrams"), 4
            ).alias("nll"),
        )
    )


def hashed_bigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = LM_BUCKETS,
) -> DataFrame:
    """(doc_id, n_bigrams, nll): per-doc mean negative log-likelihood
    under an add-1-smoothed hashed bigram LM trained on the corpus
    itself — p(cur|prev) ≈ (C(bb)+1) / (C(pb)+buckets), where C(bb)
    counts occurrences of the BIGRAM's hash bucket and C(pb) of the
    context token's bucket. Keying each count on a single bucket
    domain (never the (pb,bb) cross product) keeps BOTH model tables
    ≤ ``buckets`` rows — broadcastable at any corpus size; bucket
    collisions merging rare bigrams are the standard hashed-LM
    approximation. High nll = unlike the corpus (the perplexity-
    filter signal; ppl = e^nll, monotone — thresholds are stated on
    nll so no cross-engine exp is needed).

    Docs with < 2 tokens have no bigrams: n_bigrams = 0, nll NULL.

    Shape at 100 TB: one narrow bigram expansion feeding (a) two
    bounded-key aggregations (≤ buckets rows each — map-side combine
    does almost all the work) and (b) the scoring joins against the
    two BROADCAST count tables; one groupBy(doc). The model never
    scales with the corpus.
    """
    from chillastic_spark.persist import materialize

    grams = materialize(_bigram_stream(df, id_col, text_col, buckets))
    ctx = grams.groupBy("pb").agg(F.count(F.lit(1)).alias("ctx_ct"))
    big = grams.groupBy("bb").agg(F.count(F.lit(1)).alias("big_ct"))
    scored = score_bigrams_against(grams, ctx, big, buckets)
    ids = df.select(F.col(id_col).alias("doc_id"))
    return ids.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "nll",
    )


def bigram_nll_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = LM_BUCKETS,
) -> str:
    """DuckDB twin of hashed_bigram_nll — identical hash, smoothing,
    rounding, and DECIMAL summation."""
    w = f"regexp_split_to_array(trim({text_col}, (' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13))), '[ \\t\\n\\x0b\\f\\r]+')"
    h = "('0x' || substr(md5({e}), 1, 15))::BIGINT"
    prev_h = h.format(e="p.prev")
    big_h = h.format(e="p.prev || ' ' || p.cur")
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
    unnest(list_transform(range(1, greatest(len({w}) - 1, 0) + 1),
      i -> struct_pack(prev := {w}[i], cur := {w}[i + 1]))) AS p
  FROM {table}
), grams AS (
  SELECT doc_id, {prev_h} % {buckets} AS pb, {big_h} % {buckets} AS bb
  FROM toks
), ctx AS (
  SELECT pb, count(*) AS ctx_ct FROM grams GROUP BY pb
), big AS (
  SELECT bb, count(*) AS big_ct FROM grams GROUP BY bb
), terms AS (
  SELECT doc_id,
    floor((-ln((big_ct + 1) / CAST(ctx_ct + {buckets} AS DOUBLE)))
      * 1000000.0 + 0.5) / 1000000.0 AS nll_term
  FROM grams JOIN ctx ON grams.pb = ctx.pb JOIN big ON grams.bb = big.bb
), scored AS (
  SELECT doc_id, count(*) AS n_bigrams,
    floor((CAST(sum(CAST(nll_term AS DECIMAL(28,6))) AS DOUBLE) / count(*))
      * 10000.0 + 0.5) / 10000.0 AS nll
  FROM terms GROUP BY doc_id
)
SELECT d.{id_col} AS doc_id,
  coalesce(s.n_bigrams, 0) AS n_bigrams, s.nll
FROM {table} d LEFT JOIN scored s ON d.{id_col} = s.doc_id
"""


# ------------------------------------------------- linear classifier


def _pseudo_weight(bkt: Column) -> Column:
    """Deterministic stand-in weights in [-1, 1]: Knuth multiplicative
    hash of the bucket id. Exactly reproducible in SQL."""
    return ((bkt * 2654435761) % 2000001) / F.lit(1000000.0) - 1.0


def linear_quality_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = QC_BUCKETS,
    weights: DataFrame | None = None,
    bias: float = 0.0,
) -> DataFrame:
    """(doc_id, n_feats, margin, prob, keep): fastText-style linear
    classifier over hashed bag-of-words features — margin = bias +
    mean feature weight, prob = sigmoid(margin) on the ROUNDED margin
    (both engines exponentiate the same 6-digit double).

    ``weights`` is a (bucket, w) table from a real trained model; the
    default derives deterministic pseudo-weights from the bucket id so
    the scoring path is fully exercised without one. Either way the
    weight side is ≤ ``buckets`` rows and broadcasts.
    """
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(CF.words(text_col)).alias("tok"),
        )
        # empty tokens carry no feature (split('') yields ['']); NULL
        # text explodes to nothing — both land in the featureless
        # rejoin path below instead of vanishing or hashing ''
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            (CF.hash60(F.concat(F.col("tok"), F.lit("#qc"))) % buckets).alias("bkt"),
        )
    )
    if weights is None:
        toks = toks.withColumn("__w", CF.round_det(_pseudo_weight(F.col("bkt")), 6))
    else:
        toks = toks.join(
            F.broadcast(weights.select(F.col("bucket").alias("bkt"), F.col("w"))),
            "bkt",
            "left",
        ).withColumn("__w", F.coalesce(F.col("w"), F.lit(0.0)))
    per_doc = (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.col("__w").cast("decimal(28,6)")).alias("__s"),
        )
        .select(
            "doc_id",
            "n_feats",
            CF.round_det(
                F.lit(bias) + F.col("__s").cast("double") / F.col("n_feats"), 6
            ).alias("margin"),
        )
    )
    scored = per_doc.select(
        "doc_id",
        "n_feats",
        "margin",
        CF.round_det(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))), 6).alias(
            "prob"
        ),
    )
    # id-preserving rejoin (hashed_bigram_nll's convention): a NULL- or
    # empty-text doc must get an explicit reject row, not silently
    # vanish from the keep/reject accounting
    ids = df.select(F.col(id_col).alias("doc_id"))
    return ids.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        "margin",
        "prob",
        F.coalesce(F.col("margin") >= 0, F.lit(False)).alias("keep"),
    )


def linear_quality_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = QC_BUCKETS,
    bias: float = 0.0,
) -> str:
    w = f"regexp_split_to_array(trim({text_col}, (' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13))), '[ \\t\\n\\x0b\\f\\r]+')"
    h = "('0x' || substr(md5(tok || '#qc'), 1, 15))::BIGINT"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest({w}) AS tok FROM {table}
), feat AS (
  SELECT doc_id,
    floor((((({h} % {buckets}) * 2654435761) % 2000001) / 1000000.0 - 1.0)
      * 1000000.0 + 0.5) / 1000000.0 AS w
  FROM toks WHERE tok != ''
), per_doc AS (
  SELECT doc_id, count(*) AS n_feats,
    floor(({bias} + CAST(sum(CAST(w AS DECIMAL(28,6))) AS DOUBLE) / count(*))
      * 1000000.0 + 0.5) / 1000000.0 AS margin
  FROM feat GROUP BY doc_id
)
SELECT t.{id_col} AS doc_id, coalesce(p.n_feats, 0) AS n_feats, p.margin,
  floor((1.0 / (1.0 + exp(-p.margin))) * 1000000.0 + 0.5) / 1000000.0 AS prob,
  coalesce(p.margin >= 0, false) AS keep
FROM {table} t LEFT JOIN per_doc p ON t.{id_col} = p.doc_id
"""
