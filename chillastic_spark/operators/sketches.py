"""Mergeable frequency sketch: Misra-Gries / space-saving heavy hitters.

Companion to the HLL++ distinct-count and GK quantile sketches exposed
in queries/analytics2.py (Spark built-ins); those cover *how many
distinct* and *value distribution* — this covers *which items are
frequent* (top tokens in a corpus) in bounded memory.

Scale shape: each partition summarises its token stream into at most
``capacity`` counters inside one Arrow-batched ``mapInPandas`` pass
(the classic map-side sketch), so the shuffle moves
O(partitions × capacity) rows regardless of corpus size — at 100 TB
the exact explode+count twin (queries `top_terms`) shuffles billions
of (token, 1) rows, while this moves a few thousand counter rows.

Guarantee (standard Misra-Gries, merged with the Agarwal et al. 2012
mergeable-summaries reduction): for every token,
``est ≤ true_count ≤ est + err_bound``, and any token with
``true_count > err_bound`` is guaranteed to be present in the merged
sketch. ``err_bound`` is the sum of per-partition decrement totals.

Reference analog: the reference has no sketches (SURVEY §2.4 — plain
stats/range aggs only); this is part of the training-data extension
surface (north-star §7.6).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chillastic_spark import functions as CF

# Sentinel token carrying a partition's total decrement (error mass).
# It contains a SPACE: tokens come from splitting on [ \t\n\x0b\f\r]+, so no corpus
# token can ever contain whitespace — the previous \x00-prefixed
# sentinel was NOT collision-proof (NUL is not whitespace and survives
# the split, so a binary-contaminated corpus could fold a real token's
# counts into the error bound).
_DECR_SENTINEL = "\x00 MG DECR \x00"


def _mg_partial(capacity: int):
    """Build the per-partition Misra-Gries pass.

    Self-contained closure (stdlib + pandas only): executors don't have
    chillastic_spark on their Python path when the driver runs from
    another cwd — see operators/mutate.py for the same pattern.
    """
    sentinel = _DECR_SENTINEL
    cap = int(capacity)

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        decr = 0
        for pdf in batches:
            # Batch-merge (Agarwal et al.): add exact batch counts,
            # then reduce to `cap` counters by subtracting the
            # (cap+1)-th largest count from all and dropping <= 0.
            batch: dict[str, int] = {}
            for arr in pdf["w"]:
                if arr is None:
                    continue
                for t in arr:
                    batch[t] = batch.get(t, 0) + 1
            for t, c in batch.items():
                counters[t] = counters.get(t, 0) + c
            if len(counters) > cap:
                cut = sorted(counters.values(), reverse=True)[cap]
                counters = {t: c - cut for t, c in counters.items() if c > cut}
                decr += cut
        rows = {"token": list(counters), "est": list(counters.values())}
        rows["token"].append(sentinel)
        rows["est"].append(decr)
        yield pd.DataFrame(rows)

    return mg


def heavy_hitter_tokens(
    df: DataFrame,
    text_col: str = "text",
    capacity: int = 256,
    k: int = 20,
    words: Column | None = None,
) -> DataFrame:
    """Approximate top-k frequent tokens of a text column.

    Returns (token, est, err_bound) with est descending (token
    tie-break): ``est ≤ true ≤ est + err_bound`` for every token in the
    corpus (including ones not returned).

    Empty tokens are filtered BEFORE the sketch: ``split(trim(''))``
    yields ``['']``, so a corpus with many empty/whitespace-only docs
    would otherwise crown '' as a heavy hitter and burn a capacity
    counter on a non-token (bpe.word_frequencies applies the same
    filter). A custom ``words`` tokenizer must not emit tokens
    containing the NUL byte — the internal decrement sentinel contains
    one precisely because no whitespace- or NUL-free tokenizer can
    collide with it.
    """
    if capacity < 1:
        # capacity=0 silently returned zero tokens with the whole
        # corpus mass in err_bound; negative capacities made the
        # "bounded" sketch grow with distinct-token count — both are
        # misconfigurations, not sketches (skew.salt_buckets contract)
        raise ValueError(f"heavy_hitter_tokens capacity must be >= 1 (got {capacity})")
    from chillastic_spark.persist import materialize, persist_mode, release

    w = words if words is not None else CF.words(text_col)
    toks = df.select(F.array_remove(w, "").alias("w"))
    partial = toks.mapInPandas(_mg_partial(capacity), schema="token string, est long")
    # pin the merged counters: the err_bound branch and the token
    # branch cannot share the exchange (Catalyst pushes the sentinel
    # filters beneath the aggregate), so unpinned, the WHOLE
    # corpus-wide tokenize+sketch pass runs twice — the one-bounded-
    # pass claim of this module. The pin is ≤ (capacity+1)·partitions
    # rows; the returned top-k (≤ k rows) is pinned so the big pin can
    # be released before returning.
    merged = materialize(partial.groupBy("token").agg(F.sum("est").alias("est")))
    err = (
        merged.filter(F.col("token") == F.lit(_DECR_SENTINEL))
        .agg(F.coalesce(F.sum("est"), F.lit(0)).alias("err_bound"))
    )
    out = materialize(
        merged.filter(F.col("token") != F.lit(_DECR_SENTINEL))
        .crossJoin(F.broadcast(err))
        .orderBy(F.desc("est"), F.asc("token"))
        .limit(k)
    )
    if persist_mode() in ("local", "reliable"):
        release(merged)  # superseded by the (eager) tiny result pin
    return out
