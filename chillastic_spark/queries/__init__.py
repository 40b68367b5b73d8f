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
    # r10 panel (computed from CORRECTNESS_r01..r09): the 50 stalest —
    # every registered query now has a driver row (r9 closed the gap),
    # so the panel is 10 last driver-sampled in r6 + 40 last sampled
    # in r7 (ties broken by base registration order).
    # last driver evidence: r6
    "dedup_edit_distance", "decontaminate_flags",
    "quality_topk_per_lang", "events_gapfill", "revenue_grouping_sets",
    "dedup_ngram_containment", "value_percentiles", "sequence_packing",
    "time_weighted_avg", "keyword_search_and",
    # last driver evidence: r7
    "q7_nation_trade", "q8_market_share", "q12_priority_shipping",
    "q13_customer_distribution", "q15_top_supplier",
    "q16_part_supplier_counts", "q17_small_quantity_revenue",
    "q20_bulk_suppliers", "q22_dormant_customers", "size_stats",
    "distinct_slices", "backlog_union", "reroute_by_month",
    "events_hourly", "session_window_stats", "dedup_substring_spans",
    "dedup_winnow_pairs", "simhash_pairs", "knn_graph_edges",
    "ann_lsh_topk", "repetition_scores", "bpe_token_stats",
    "embedding_int8_checksum", "more_like_this", "pii_scrub_report",
    "dsir_importance_weights", "domain_mixture_manifest",
    "mixture_sample_counts", "dedup_keep_best", "dedup_incremental",
    "semantic_dedup_manifest", "gopher_quality_flags",
    "c4_line_filter", "table_profile", "leakage_safe_splits",
    "splits_incremental", "source_overlap_matrix", "shard_manifest",
    "perplexity_filter", "quality_classifier_scores",
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
