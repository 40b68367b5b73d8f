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
    # r9 panel (computed from CORRECTNESS_r01..r08): the 50 stalest —
    # 3 never-sampled (registered r8; r8 verdict next-round #1 puts
    # them first), 7 last driver-sampled in r5, 40 last sampled in r6.
    # never driver-sampled (registered r8)
    "dedup_jaccard_capped", "embedding_dup_incremental",
    "ann_ivf_pq_topk",
    # last driver evidence: r5
    "source_diversity", "top_collocations", "source_oov_rate",
    "bool_search", "wildcard_search", "search_snippets",
    "terms_set_query",
    # last driver evidence: r6
    "q1_pricing_summary", "q3_shipping_priority", "q6_forecast_revenue",
    "top_customers", "nation_order_stats", "q4_late_orders",
    "above_avg_balance", "q10_returned_items", "q14_promo_share",
    "q18_large_orders", "rollup_nation_status", "distinct_counts",
    "top_terms", "event_funnel", "q2_min_cost_parts",
    "q9_product_profit", "q11_important_parts",
    "q21_sole_returned_supplier", "scan_projection",
    "asof_view_before_purchase", "scalar_functions", "size_histogram",
    "backlog_totals", "resume_anti_join", "latest_event_per_user",
    "mutate_pipeline", "sessionize", "events_json_extract",
    "text_features", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_clusters", "dedup_simhash",
    "chunk_windows", "similarity_topk", "embedding_centroids",
    "embedding_dup_pairs", "tfidf_top_terms", "q19_discounted_revenue",
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
