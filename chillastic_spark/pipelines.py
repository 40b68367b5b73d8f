"""End-to-end training-data curation pipeline.

Composes the operator library into the standard LLM-data flow:

    raw documents
      → scrub (URL/email/phone redaction)
      → text features (tokens / quality / lang-id / fingerprint)
      → quality gate            (drop low-quality docs)
      → exact dedup             (content fingerprint, keep min id)
      → near dedup              (MinHash-LSH pairs → drop the larger id)
      → chunking                (overlapping token windows)

Everything is DataFrame-native: the whole pipeline is ONE Spark job
graph with three shuffles (fingerprint group, minhash signatures,
pair join) regardless of corpus size. ``curate`` returns the chunk
table plus a per-stage audit report (counts survive/pruned) — the
numbers a data-curation run has to publish.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chillastic_spark.operators import dedup as D
from chillastic_spark.operators import text as T
from chillastic_spark.operators.chunking import chunk_documents


@dataclass
class CurationConfig:
    scrub: bool = True  # redact URLs/emails/phones first (operators/scrub.py)
    min_quality: float = 0.3
    min_tokens: int = 8
    near_dup_threshold: float = 0.5
    minhash_perms: int = 16
    minhash_bands: int = 4
    shingle_n: int = 3
    chunk_size: int = 50
    chunk_stride: int = 40
    keep_langs: list[str] = field(default_factory=list)  # empty = all


@dataclass
class CurationReport:
    input_docs: int
    after_quality_gate: int
    after_exact_dedup: int
    after_near_dedup: int
    chunks: int

    def as_dict(self) -> dict:
        return vars(self)


def curate(
    df: DataFrame,
    config: CurationConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, CurationReport]:
    """Run the curation flow; returns (chunk_table, report).

    The intermediate doc set is localCheckpoint()ed once after the
    gates (it feeds minhash, the pair anti-join, and chunking); on a
    cluster this is where you'd persist/checkpoint to cluster storage.
    """
    cfg = config or CurationConfig()
    input_docs = df.count()

    if cfg.scrub:
        from chillastic_spark.operators.scrub import scrub_text

        df = df.withColumn(text_col, scrub_text(text_col))

    feats = T.with_text_features(df, text_col)
    gated = feats.filter(
        (F.col("quality") >= cfg.min_quality) & (F.col("n_tokens") >= cfg.min_tokens)
    )
    if cfg.keep_langs:
        gated = gated.filter(F.col("pred_lang").isin(cfg.keep_langs))
    after_quality = gated.count()

    # exact dedup on the full-content fingerprint (already computed)
    keep = gated.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    exact = gated.join(keep, ["fingerprint", id_col], "left_semi").localCheckpoint()
    after_exact = exact.count()

    # near dedup: MinHash-LSH candidate pairs → drop the larger id
    pairs = D.minhash_lsh_pairs(
        exact,
        id_col=id_col,
        text_col=text_col,
        n=cfg.shingle_n,
        num_perm=cfg.minhash_perms,
        bands=cfg.minhash_bands,
        threshold=cfg.near_dup_threshold,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    near = exact.join(losers, id_col, "left_anti")
    after_near = near.count()

    chunks = chunk_documents(
        near, id_col=id_col, text_col=text_col,
        size=cfg.chunk_size, stride=cfg.chunk_stride,
    )
    n_chunks = chunks.count()

    return chunks, CurationReport(
        input_docs=input_docs,
        after_quality_gate=after_quality,
        after_exact_dedup=after_exact,
        after_near_dedup=after_near,
        chunks=n_chunks,
    )
