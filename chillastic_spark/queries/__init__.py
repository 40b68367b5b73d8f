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
    # ROTATION POLICY (LRU, r5 verdict #8): each round the panel is the
    # 50 registered queries whose most-recent driver-verified
    # CORRECTNESS row is OLDEST (ties broken by prior registration
    # order), so evidence freshness compounds instead of decaying.
    # Computed mechanically from CORRECTNESS_r01..r{N-1}.
    #
    # r8 panel (computed from CORRECTNESS_r01..r07): the 50 stalest —
    # 1 never-sampled (new this round), 6 last driver-sampled in r4,
    # 43 last sampled in r5.
    # never driver-sampled (registered r8)
    "embedding_dup_pairs_unblocked",
    # last driver evidence: r4
    "knn_pagerank", "rollup_incremental_refresh", "source_unigram_kl",
    "significant_terms", "fuzzy_search", "search_facets",
    # last driver evidence: r5
    "q5_local_supplier_volume", "count_per_slice", "snapshot_reconcile",
    "dedup_jaccard_prefix", "multimodal_meta", "image_phash_pairs",
    "embedding_outliers", "semantic_decontaminate_flags",
    "ann_ivf_topk", "ann_pq_topk", "events_pivot", "skew_top_keys",
    "geomean_value_by_type", "value_outliers", "source_similarity",
    "rolling_event_stats", "median_value_by_type",
    "sketch_distinct_users", "sketch_value_quantiles",
    "events_daily_rollup", "user_retention_cohorts",
    "audio_features_meta", "source_quality_report", "sample_stratified",
    "purchase_prior_window", "token_histogram", "balance_deciles",
    "balance_deciles_approx", "event_transitions",
    "referential_integrity", "dedup_containment_prefix",
    "basket_part_pairs", "dataset_split_manifest",
    "events_unpivot_roundtrip", "quality_percentile_gate", "events_ohlc",
    "heavy_hitter_terms", "value_winsorized_stats", "top_event_paths",
    "bpe_merge_candidates", "bpe_trained_merges", "source_unigram_psi",
    "knn_communities",
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
