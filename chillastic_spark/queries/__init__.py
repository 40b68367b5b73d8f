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
# (r3 verdict #7) so driver-verified coverage compounds: ~20 keepers
# anchor one representative per operator family (all driver-green in
# CORRECTNESS_r03), and the other 30 slots go to queries that so far
# had only local-twin evidence. Rotated out in r4 (driver-green in
# r03, still locally twinned every round): q6_forecast_revenue,
# top_customers, q4_late_orders, rollup_nation_status, event_funnel,
# q2_min_cost_parts, q21_sole_returned_supplier,
# asof_view_before_purchase, scalar_functions, size_histogram,
# backlog_totals, latest_event_per_user, text_features,
# dedup_clusters, dedup_simhash, dedup_ngram_containment,
# dedup_edit_distance, embedding_centroids, keyword_search_and,
# phrase_search, search_rank_eval, search_after_page, search_rescore,
# multi_match_best_fields, q19_discounted_revenue,
# quality_topk_per_lang, revenue_grouping_sets, value_percentiles,
# sequence_packing, time_weighted_avg. Swapped mid-r4 for the six
# never-sampled batch-16 queries (all r03-green, locally twinned every
# round): q18_large_orders, q9_product_profit, sessionize, dedup_exact,
# dedup_minhash_lsh, chunk_windows. Mid-r4 swap 2: six more r03-green
# keepers rotated out (q10_returned_items, resume_anti_join,
# embedding_dup_pairs, hybrid_search_rrf, events_gapfill,
# decontaminate_flags — every family still anchored) so the six
# batch-17/18 queries get first driver sampling this round.
PANEL_FIRST = [
    # relational core (keepers, then never-sampled TPC-H flavours)
    "q5_local_supplier_volume", "q7_nation_trade", "q8_market_share",
    "q12_priority_shipping",
    "q13_customer_distribution", "q15_top_supplier",
    "q16_part_supplier_counts", "q17_small_quantity_revenue",
    "q20_bulk_suppliers", "q22_dormant_customers",
    # engine parity (reference operators)
    "count_per_slice", "size_stats", "distinct_slices", "backlog_union",
    "reroute_by_month", "session_window_stats", "events_hourly",
    # documents / dedup family
    "dedup_substring_spans", "dedup_winnow_pairs", "simhash_pairs",
    "repetition_scores", "bpe_token_stats",
    # batch 16 (first driver sampling this round)
    "pii_scrub_report", "dsir_importance_weights",
    "domain_mixture_manifest", "dedup_keep_best", "dedup_incremental",
    "semantic_dedup_manifest",
    # batch 17/18 (first driver sampling this round)
    "gopher_quality_flags", "c4_line_filter", "table_profile",
    "leakage_safe_splits", "source_overlap_matrix", "shard_manifest",
    # batch 19/20 + late-r4 additions (first driver sampling; swapped
    # in for nine r03-driver-verified keepers — q1/q3/scan_projection/
    # mutate_pipeline/dedup_ngram_jaccard/similarity_topk/bm25_topk/
    # percolate/tfidf_top_terms — every family still anchored)
    "perplexity_filter", "quality_classifier_scores",
    "busy_window_counts", "video_frame_stats", "splits_incremental",
    "knn_pagerank", "mixture_sample_counts",
    "rollup_incremental_refresh", "source_unigram_kl",
    # vectors
    "knn_graph_edges", "ann_lsh_topk", "embedding_int8_checksum",
    # search
    "fuzzy_search", "search_facets", "significant_terms",
    "more_like_this",
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
