"""Driver-facing query inventory.

Each submodule exposes ``QUERIES: dict[str, Query]`` mapping a stable
query name to a (spark_fn, oracle_sql) pair. ``__spark_entry__``
aggregates them for the correctness driver; bench.py picks headliners.

Determinism contract (what makes the duckdb value-hash match):
* money/quantity sums go through DECIMAL casts → exact, engine-independent
* per-row double math uses the identical expression tree on both sides
* every rank/top-k orders by the ROUNDED score with an id tie-break
* every computed column is aliased identically in Spark and SQL
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # duckdb oracle; None → rows-only check
    headline: bool = False  # include in bench.py


# The correctness driver samples the FIRST 50 registered queries, so
# registration order IS panel selection. The list ROTATES each round
# (r3 verdict #7) so driver-verified coverage compounds; rotation
# history lives in CORRECTNESS_r01–r04 + git history of this file.
# Everything rotated out stays locally twinned by scripts/check.py
# every round.
PANEL_FIRST = [
    # r5 rotation (r4 verdict #1): the 45 queries that had never been
    # driver-sampled in CORRECTNESS_r01–r04 fill 45 slots, so after
    # this round EVERY registered query has at least one
    # driver-verified row. The remaining 5 slots: the THREE queries
    # registered mid-r5 (balance_deciles_approx, dedup_jaccard_prefix,
    # dedup_containment_prefix — no driver row yet) plus two family
    # anchors already driver-green in a prior round (q5 relational,
    # count_per_slice engine parity). dedup_minhash_lsh, ann_lsh_topk
    # and fuzzy_search, originally pencilled in as anchors, gave up
    # their slots to the mid-round additions — they are r4-green.
    # relational / analytics (never sampled)
    "snapshot_reconcile", "events_pivot", "skew_top_keys",
    "geomean_value_by_type", "value_outliers", "rolling_event_stats",
    "median_value_by_type", "events_daily_rollup",
    "user_retention_cohorts", "sample_stratified",
    "purchase_prior_window", "balance_deciles", "event_transitions",
    "referential_integrity", "basket_part_pairs",
    "events_unpivot_roundtrip", "events_ohlc", "value_winsorized_stats",
    "top_event_paths", "quality_percentile_gate",
    # sketches / approx (never sampled)
    "sketch_distinct_users", "sketch_value_quantiles",
    "heavy_hitter_terms",
    # documents / text / curation (never sampled)
    "token_histogram", "source_similarity", "source_quality_report",
    "source_diversity", "top_collocations", "source_oov_rate",
    "source_unigram_psi", "dataset_split_manifest",
    "semantic_decontaminate_flags", "bpe_merge_candidates",
    "bpe_trained_merges",
    # multimodal (never sampled)
    "multimodal_meta", "image_phash_pairs", "audio_features_meta",
    # vectors / graph (never sampled)
    "embedding_outliers", "ann_ivf_topk", "ann_pq_topk",
    "knn_communities",
    # search (never sampled)
    "bool_search", "wildcard_search", "search_snippets",
    "terms_set_query",
    # r5 additions with no driver row yet — driver evidence in their
    # first round
    "balance_deciles_approx", "dedup_jaccard_prefix",
    "dedup_containment_prefix",
    # family anchors (driver-green in prior rounds)
    "q5_local_supplier_volume", "count_per_slice",
]


def all_queries() -> dict[str, Query]:
    from chillastic_spark.queries import (
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
        analytics8,
        analytics9,
        analytics10,
        analytics11,
        documents,
        engine_parity,
        relational,
        relational2,
        relational3,
        search,
        search2,
        search3,
        vectors,
    )

    out: dict[str, Query] = {}
    for mod in (
        relational,
        relational2,
        relational3,
        engine_parity,
        documents,
        vectors,
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
        analytics8,
        analytics9,
        analytics10,
        analytics11,
        search,
        search2,
        search3,
    ):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    missing = [n for n in PANEL_FIRST if n not in out]
    if missing:
        raise ValueError(f"PANEL_FIRST names not registered: {missing}")
    ordered = {n: out[n] for n in PANEL_FIRST}
    ordered.update((n, q) for n, q in out.items() if n not in ordered)
    return ordered
