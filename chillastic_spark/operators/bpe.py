"""Distributed BPE tokenizer training (Sennrich et al. 2016
arXiv:1508.07909) — the tokenizer-training step of an LLM data
pipeline, structured the way corpus-scale trainers actually run:

1. ONE pass over the corpus builds the word-frequency table
   (groupBy word — bounded by |vocabulary|, not corpus size).
2. Every merge round then runs on that small vocab table only:
   explode adjacent symbol pairs (weighted by word count) → one
   aggregation → argmax on the driver (a 1-row take) → a narrow
   array-fold rewrite of the symbol sequences.

So a 100 TB corpus pays one scan + one shuffle total; the N merge
rounds cost N small jobs over |vocab| rows. Symbol sequences carry
the classic ``</w>`` end-of-word marker. Ties break (count desc,
pair lexicographic asc) so training is deterministic — pinned against
a pure-Python replay in tests.

The trained merge list is driver-sized (N entries) by construction —
collecting it is not a distributed-operator smell, it IS the model.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chillastic_spark import functions as CF
from chillastic_spark.persist import materialize, release

EOW = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, wc): the corpus's word-frequency table — the single
    corpus-wide pass; everything after runs on this."""
    tok = F.explode(CF.words(text_col)).alias("word")
    out = df.select(tok)
    if lowercase:
        out = out.select(F.lower("word").alias("word"))
    return out.filter(F.col("word") != "").groupBy("word").agg(
        F.count(F.lit(1)).alias("wc")
    )


def _initial_symbols(word: Column) -> Column:
    """Character symbols + the </w> marker. split('', '') yields ['']
    (one spurious empty symbol) — purged so the encoder twin contract
    holds on dirty data: encode_local('') is ['</w>'], and training is
    only protected by word_frequencies' own word != '' filter."""
    return F.concat(
        F.array_remove(F.split(word, ""), ""),  # one element per character
        F.array(F.lit(EOW)),
    )


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Greedy leftmost non-overlapping merge of adjacent (a, b) → ab —
    a single array fold, no UDF."""
    joined = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(joined))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, total) adjacent-pair counts weighted by word frequency."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at("syms", i).alias("a"),
            F.element_at("syms", i + 1).alias("b"),
        ),
    )
    pairs = F.when(F.size("syms") >= 2, pairs).otherwise(
        F.array().cast("array<struct<a:string,b:string>>")
    )
    return (
        vocab.select("wc", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("wc").alias("total"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    lowercase: bool = True,
    min_pair_count: int = 2,
    batch_m: int = 1,
    stats: "dict | None" = None,
) -> "list[tuple[str, str]]":
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list [(a, b), ...]. Stops early when the best
    remaining pair occurs fewer than ``min_pair_count`` times.

    ``batch_m`` > 1 is the 32k-vocab scale path: one Spark job per
    merge is fine for hundreds of merges, not tens of thousands, so
    each round selects up to M merges from ONE pair-count aggregation
    and applies them in ONE vocab rewrite. The selected set is the
    longest PREFIX of the (count desc, pair asc) candidate ranking
    whose merges are pairwise NON-INTERACTING — no candidate shares a
    symbol (or its joined output) with an earlier selection. Merging
    (a,b)→ab only fuses a·b adjacencies and never creates adjacency
    between its neighbours, so disjoint merges leave each other's pair
    counts exactly unchanged and the single batched rewrite equals
    applying them sequentially — parity with batch_m=1 is exact for
    every merge the prefix admits (pinned in tests on the real
    corpus). The one divergence window: a brand-new pair CREATED by an
    earlier in-batch merge could, under strictly sequential training,
    overtake a later in-batch candidate; the prefix rule cannot see it
    without a recount, which is the recount-per-merge cost batching
    exists to avoid. In practice early-round count gaps dwarf it
    (sequential-parity test passes on the documents corpus at M=4).

    Each round pins the rewritten vocab via the shared
    ``persist.materialize`` (iterative=True — the cluster mode is a
    reliable checkpoint) so the lineage stays flat across rounds (same
    pattern as connected_components). ``stats``, when given, records
    {"rounds": <aggregation rounds run>} so tests can assert the
    job-count win.
    """
    vocab = word_frequencies(df, text_col, lowercase).select(
        "wc", _initial_symbols(F.col("word")).alias("syms")
    )
    vocab = materialize(vocab, iterative=True)
    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < n_merges:
        want = min(batch_m, n_merges - len(merges))
        cand = (
            _pair_counts(vocab)
            .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .limit(max(2 * want, want + 1))
            .collect()
        )
        rounds += 1
        batch: list[tuple[str, str]] = []
        used: set[str] = set()
        for r in cand:
            if len(batch) >= want or r["total"] < min_pair_count:
                break
            syms = {r["a"], r["b"], r["a"] + r["b"]}
            if batch and (syms & used):
                break  # prefix rule: stop at the first interaction
            batch.append((r["a"], r["b"]))
            used |= syms
        if not batch:
            break
        merges.extend(batch)
        col = F.col("syms")
        for a, b in batch:
            col = _merge_pair(col, a, b)
        prev = vocab
        vocab = materialize(
            vocab.select("wc", col.alias("syms")), iterative=True
        )
        # release the PREVIOUS round's checkpoint once this round is
        # materialized — a 32k-vocab training (thousands of rounds)
        # must pin 2 vocab tables, not one per round (same pattern as
        # graph.pagerank / components.connected_components)
        release(prev)
    # the FINAL round's pin outlives nothing: merges is a plain Python
    # list, so an unreleased vocab checkpoint would sit in executor
    # storage for the session per train_bpe call (the production
    # caller runs outside any batch_scope)
    release(vocab)
    if stats is not None:
        stats["rounds"] = rounds
    return merges


def encode_words(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    word_col: str = "word",
    lowercase: bool = True,
) -> DataFrame:
    """``df`` plus a ``bpe`` column: the word's BPE symbol sequence
    under the trained merge list — the merges applied IN TRAINING
    ORDER, each as one array fold (no UDF; a production encoder with
    thousands of merges would batch this into an Arrow UDF instead,
    but the semantics are this)."""
    w = F.lower(F.col(word_col)) if lowercase else F.col(word_col)
    syms = _initial_symbols(w)
    for a, b in merges:
        syms = _merge_pair(syms, a, b)
    return df.withColumn("bpe", syms)


def merge_local(syms: "list[str]", a: str, b: str) -> "list[str]":
    """Pure-Python twin of ``_merge_pair`` — THE greedy-merge
    semantics, shared by the local trainer and encoder replays so the
    reference can never fork from itself."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def encode_local(word: str, merges: "list[tuple[str, str]]") -> "list[str]":
    """Pure-Python twin of ``encode_words`` for one word."""
    syms = list(word) + [EOW]
    for a, b in merges:
        syms = merge_local(syms, a, b)
    return syms


def train_bpe_local(
    word_counts: "dict[str, int]", n_merges: int, min_pair_count: int = 2
) -> "list[tuple[str, str]]":
    """Pure-Python reference replay (the test oracle): identical
    greedy merge, count, and tie-break semantics."""
    vocab = {
        tuple(list(wd) + [EOW]): c for wd, c in word_counts.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + c
                )
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        out: dict[tuple, int] = {}
        for syms, c in vocab.items():
            merged = tuple(merge_local(list(syms), a, b))
            out[merged] = out.get(merged, 0) + c
        vocab = out
    return merges
