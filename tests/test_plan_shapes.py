"""Plan-shape regression guards: the optimizations that matter at
100 TB must stay visible in the physical plan — a refactor that loses
a pushdown or broadcasts nothing should fail here, not at the bench.
"""
import pytest

from chillastic_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    from conftest import plan_of

    return plan_of(spark, all_queries()[name].fn(spark, SF))


def test_q1_filter_pushed_and_pruned(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns reach the scan
    assert "l_comment" not in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert read.count(":") <= 9  # 7 cols + struct<> syntax


def test_q6_all_filters_pushed(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    for f in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({f})" in plan


def test_q3_broadcasts_dimensions(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_all_dims(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    # customer/supplier/nation/region all broadcast → ≥4 broadcast joins
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan or plan.count("Exchange") <= 4


def test_scan_projection_reads_three_columns(spark):
    plan = _plan(spark, "scan_projection")
    assert "GreaterThanOrEqual(n_chars,100)" in plan
    assert "text" not in [  # the wide text column must NOT be read
        seg for seg in plan.split("ReadSchema: ")[1].split("\n")[0].split(",")
    ]


def test_dedup_has_no_cartesian(spark):
    for name in (
        "dedup_ngram_jaccard",
        "dedup_jaccard_prefix",
        "dedup_containment_prefix",
        "dedup_minhash_lsh",
        "embedding_dup_pairs",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_topk_per_group_uses_window_group_limit(spark):
    """row_number()<=k must compile to Partial+Final WindowGroupLimit:
    each map task keeps only k rows per group BEFORE the shuffle, so a
    low-cardinality partition key (4 languages) is not a skew bomb."""
    plan = _plan(spark, "quality_topk_per_lang")
    assert plan.count("WindowGroupLimit") >= 2
    assert "Partial" in plan  # the map-side phase is present


def test_grouping_sets_is_one_scan_plus_expand(spark):
    """Four grains must compile to ONE orders scan + Expand, not four
    scans unioned — the whole point of GROUPING SETS at 100 TB."""
    plan = _plan(spark, "revenue_grouping_sets")
    assert "Expand" in plan
    assert plan.count("orders.parquet") == 1
    assert "BroadcastHashJoin" in plan  # nation dim broadcast


def test_gapfill_joins_aggregates_not_raw_events(spark):
    """The grid join must sit ABOVE the hourly aggregation: exactly one
    events scan feeds the agg, and no nested-loop shape appears."""
    plan = _plan(spark, "events_gapfill")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the checkpointed hourly aggregate feeds both consumers: the raw
    # events scan appears at most once (0 = lineage starts at the
    # materialised aggregate, never a second raw scan)
    assert plan.count("events.parquet") <= 1


def test_basket_pairs_is_equi_join_topk(spark):
    """Co-occurrence must run as an equi-join on l_orderkey (the range
    predicate applied after), with top-k as TakeOrderedAndProject —
    never a cross/nested-loop join or a global sort."""
    plan = _plan(spark, "basket_part_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_referential_audit_prunes_to_key_columns(spark):
    """Each anti-join side must read only its key column — the audit
    never pays for full-width rows."""
    plan = _plan(spark, "referential_integrity")
    assert "struct<l_orderkey:bigint>" in plan
    assert "struct<o_custkey:bigint>" in plan


def test_percentiles_share_one_exchange_for_both_windows(spark):
    """row_number and count(*) partition identically — the plan must
    contain exactly one exchange on event_type for the window stage
    (plus the final small group-by exchange)."""
    plan = _plan(spark, "value_percentiles")
    assert plan.count("events.parquet") == 1
    # the two window functions ride the same hashpartitioning exchange
    assert plan.count("hashpartitioning(event_type") <= 2


def test_batch10_single_exchange_single_scan(spark):
    """packing / TWA / OHLC: one window (or cumsum) shuffle whose
    partitioning is reused by the groupBy — a second hash Exchange or a
    duplicate scan is a regression."""
    for name, table in (
        ("sequence_packing", "documents"),
        ("time_weighted_avg", "events"),
        ("events_ohlc", "events"),
    ):
        plan = _plan(spark, name)
        assert plan.count("- Exchange") == 1, name
        assert plan.count(f"{table}.parquet") == 1, name


@pytest.mark.parametrize(
    "name",
    [
        "hybrid_search_rrf",
        "search_rescore",
        "search_after_page",
        "search_rank_eval",
    ],
)
def test_search_rankings_have_no_global_window(spark, name):
    """Corpus-scale rankings must be TakeOrderedAndProject top-k's
    (parallel partial top-k per partition) — a Window with an EMPTY
    partition spec serializes the whole ranking through one task at
    100 TB. operators/topk.py is the sanctioned shape."""
    plan = _plan(spark, name)
    assert "TakeOrderedAndProject" in plan, name
    assert "Window" not in plan, name  # no WindowExec at all in these


@pytest.mark.parametrize("name", ["q15_top_supplier", "more_like_this"])
def test_last_global_windows_are_gone(spark, name):
    """The r3 verdict's final two global windows: q15's scalar max is
    now a 1-row broadcast aggregate + equality join, more_like_this
    ranks interesting terms via ranked_topk — no WindowExec anywhere."""
    plan = _plan(spark, name)
    assert "Window" not in plan, name
    assert "BroadcastExchange" in plan, name


def test_no_separate_driver_count_job(spark):
    """tfidf/multi_match derive N via an in-plan 1-row broadcast
    aggregate — the documents scan count must equal the plan's own
    needs, with no collected scalar baked in as a literal."""
    for name in ("tfidf_top_terms", "multi_match_best_fields"):
        plan = _plan(spark, name)
        assert "BroadcastExchange" in plan, name
        # the N aggregate rides the same plan: ≥2 documents scans in ONE
        # plan (corpus + stats), rather than a prior .count() job
        assert plan.count("documents.parquet") >= 2, name


def test_quality_gate_scans_needed_columns_only(spark):
    plan = _plan(spark, "quality_percentile_gate")
    read = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "text" in read and "lang" in read and "doc_id" in read
    assert "source" not in read and "n_chars" not in read


def test_batch16_plan_shapes(spark):
    # PII audit: one documents scan, no shuffle beyond the final agg
    # (formatted explain names each node twice: tree + details)
    plan = _plan(spark, "pii_scrub_report")
    assert plan.count("documents.parquet") == 1
    assert plan.count("Exchange") <= 2
    # DSIR: the bucket log-ratio table must come back as a BROADCAST
    # join onto the token stream (never a shuffle join on tokens), and
    # since r7 the id-preserving output needs NO full-corpus rejoin —
    # the explode_outer marker rows make the per-doc aggregate
    # id-complete, so a SortMergeJoin anywhere is a regression
    plan = _plan(spark, "dsir_importance_weights")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the two model-based filters share the marker-row convention:
    # their per-doc aggregates are id-complete, so a SortMergeJoin
    # (the old full-corpus id rejoin) anywhere is a regression
    for q in ("perplexity_filter", "quality_classifier_scores"):
        plan = _plan(spark, q)
        assert "SortMergeJoin" not in plan, q
        assert "CartesianProduct" not in plan, q
    # mixture manifest: the corpus is scanned ONCE (at the per-source
    # aggregate's materialization); the final plan runs off the
    # checkpointed |sources|-row table, never re-reading documents
    plan = _plan(spark, "domain_mixture_manifest")
    assert plan.count("documents.parquet") == 0
    assert "Checkpoint" in plan or "Scan ExistingRDD" in plan
    # incremental dedup: banded equi-join only, never all-pairs
    plan = _plan(spark, "dedup_incremental")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_late_r4_plan_shapes(spark):
    # KL drift: one token-stream shuffle; the sources/totals sides come
    # back as broadcasts, never a shuffled or nested-loop cartesian on
    # the bucket domain
    plan = _plan(spark, "source_unigram_kl")
    assert plan.count("documents.parquet") <= 1
    assert "CartesianProduct" not in plan
    # mixture execution: per-source rates join the corpus as a
    # BROADCAST hash join (the |sources|-row side never shuffles docs)
    plan = _plan(spark, "mixture_sample_counts")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # incremental rollup: the merge join runs on bucket-cardinality
    # aggregates — no window, no cartesian
    plan = _plan(spark, "rollup_incremental_refresh")
    assert "CartesianProduct" not in plan
    assert "WindowExec" not in plan
    # snapshot diff: single equi-join diff, fingerprints in the scan
    plan = _plan(spark, "snapshot_reconcile")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_collocations_topk_no_window_no_cartesian(spark):
    plan = _plan(spark, "top_collocations")
    assert "TakeOrderedAndProject" in plan
    assert "WindowExec" not in plan
    assert "CartesianProduct" not in plan


def test_balance_deciles_approx_no_global_window(spark):
    """The sketch-path deciles twin must never fall back to the exact
    query's single-task total sort: no window, no global Sort — just
    the sketch agg, a broadcast of the 1-row cut array, and a 10-key
    hash agg."""
    plan = _plan(spark, "balance_deciles_approx")
    assert "Window" not in plan and "ntile(" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row cut broadcast


def test_events_hourly_minimal_plan(spark):
    """r4 bench drift on events_hourly (0.346->0.468s) was measured
    against an identical plan — pin the shape so any FUTURE regression
    is a real plan change, not noise: one 3-column pruned scan, a
    map-side partial agg into exactly one hash exchange, and the
    contract orderBy's range exchange. No joins, no windows."""
    plan = _plan(spark, "events_hourly")
    assert plan.count("events.parquet") == 1  # exactly one scan
    assert plan.count("- Exchange") == 2  # agg hash + orderBy range
    assert "partial_count" in plan  # map-side combine survives
    assert "Join" not in plan and "Window" not in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("ts", "event_type", "value"):
        assert col in read
    assert "user_id" not in read and "event_id" not in read


def _unpartitioned_windows(plan: str) -> list[str]:
    """Window specs whose FIRST argument is a sort spec (contains
    ASC/DESC) — i.e. windows with an empty PARTITION BY, which at
    100 TB are a single-task total sort."""
    bad = []
    for seg in plan.split("windowspecdefinition(")[1:]:
        first = seg.split(",")[0]
        if " ASC" in first or " DESC" in first:
            bad.append(first.strip())
    return bad


def test_balance_deciles_exact_no_global_window(spark):
    """The r6 exact-deciles rewrite: EXACT ntile semantics from
    range-partitioned ranking — repartitionByRange +
    sortWithinPartitions (both behind the materialize boundary, so
    the visible plan starts at the checkpointed RDD scan), then
    monotonically_increasing_id decodes to (pid, local offset) and
    rank is a narrow projection over the broadcast offset map. NO
    window of any kind and NO exchange besides the final 10-key agg;
    ntile() must never reappear."""
    plan = _plan(spark, "balance_deciles")
    assert "ntile(" not in plan
    assert "Window" not in plan
    assert _unpartitioned_windows(plan) == []
    assert "monotonically_increasing_id" in plan
    # exactly one exchange: the final decile hash agg
    assert plan.count("- Exchange") == 1
    assert "hashpartitioning(decile" in plan


def test_no_unpartitioned_window_registry_sweep(spark):
    """No registered query may plan an unpartitioned WindowExec — the
    one documented exception is busy_window_counts, whose global
    island window runs over the ≤|distinct hours| aggregate, not the
    corpus (analytics11.py docstring)."""
    from chillastic_spark.queries import all_queries

    allow = {"busy_window_counts"}
    offenders = {}
    swept = 0
    for name, q in all_queries().items():
        if name in allow:
            continue
        # NO exception swallowing: every registered query plans cleanly
        # at sf0.001 (probed), so a build failure here is a regression —
        # and silently skipping would make this guarantee vacuous
        plan = _plan(spark, name)
        swept += 1
        bad = _unpartitioned_windows(plan)
        if bad:
            offenders[name] = bad
    assert not offenders, offenders
    assert swept >= 150  # the sweep really covered the registry
