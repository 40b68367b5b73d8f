"""Batch-8 operator tests: gap-fill density/LOCF, grouping-sets grain
consistency, decile balance, transition-row stochasticity, audit
coverage, and containment-vs-Jaccard dominance."""
import pyspark.sql.functions as F

from chillastic_spark.operators import dedup as D
from chillastic_spark.queries.analytics4 import (
    balance_deciles,
    event_transitions,
    events_gapfill,
    referential_integrity,
    revenue_grouping_sets,
)
from chillastic_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_gapfill_grid_is_dense_and_locf_fills(spark):
    rows = events_gapfill(spark, SF).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["hour"])
        # dense: consecutive hours, no holes in the grid itself
        for a, b in zip(rs, rs[1:]):
            assert (b["hour"] - a["hour"]).total_seconds() == 3600, et
        # first row is a real observation (grid starts at min(hour))
        assert not rs[0]["gap_filled"]
        # LOCF: after the first row, sum_value_locf is never null
        assert all(r["sum_value_locf"] is not None for r in rs)
        # filled rows carry zero counts
        assert all(r["n_events"] == 0 for r in rs if r["gap_filled"])


def test_gapfill_observed_counts_match_plain_groupby(spark):
    e = load(spark, SF, "events")
    want = {
        (r["event_type"], r["hour"]): r["n"]
        for r in e.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {
        (r["event_type"], r["hour"]): r["n_events"]
        for r in events_gapfill(spark, SF).collect()
        if not r["gap_filled"]
    }
    assert got == want


def test_grouping_sets_grains_are_consistent(spark):
    rows = revenue_grouping_sets(spark, SF).collect()
    total = [r for r in rows if r["nation"] == "ALL" and r["order_year"] == "ALL"]
    per_nation = [r for r in rows if r["nation"] != "ALL" and r["order_year"] == "ALL"]
    per_year = [r for r in rows if r["nation"] == "ALL" and r["order_year"] != "ALL"]
    assert len(total) == 1
    assert per_nation and per_year
    # counts roll up exactly across every grain
    assert sum(r["n_orders"] for r in per_nation) == total[0]["n_orders"]
    assert sum(r["n_orders"] for r in per_year) == total[0]["n_orders"]
    # revenue rolls up to the cent (decimal sums underneath)
    assert abs(sum(r["revenue"] for r in per_nation) - total[0]["revenue"]) < 0.01


def test_balance_deciles_are_balanced_and_ordered(spark):
    rows = sorted(balance_deciles(spark, SF).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n_customers"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # ntile balance property
    for a, b in zip(rows, rows[1:]):
        assert a["max_bal"] <= b["min_bal"]  # deciles partition the ordered axis


def test_event_transitions_rows_are_stochastic(spark):
    rows = event_transitions(spark, SF).collect()
    assert rows
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rs in by_prev.items():
        assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-4, prev


def test_referential_integrity_covers_all_checks(spark):
    rows = {r["check_name"]: r["orphans"] for r in referential_integrity(spark, SF).collect()}
    assert set(rows) == {
        "orders_without_customer",
        "lineitem_without_order",
        "lineitem_without_part",
        "lineitem_without_supplier",
        "events_null_user",
    }
    # synthetic star schema is referentially clean
    assert all(v == 0 for v in rows.values())


def test_containment_dominates_jaccard(spark):
    """containment = common/min(|A|,|B|) ≥ jaccard = common/|A∪B| on
    every candidate pair; identical docs hit containment 1.0."""
    d = load(spark, SF, "documents")
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(d, n=3, threshold=0.5).collect()
    }
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in D.ngram_containment_pairs(d, n=3, threshold=0.5).collect()
    }
    assert jac and cont
    # every Jaccard-qualified pair also qualifies on containment
    for pair, j in jac.items():
        assert pair in cont
        assert cont[pair] >= j - 1e-9


def test_balance_deciles_approx_error_bound(spark):
    """The sketch-path twin's contract: decile populations within the
    approx_percentile rank-error bound of N/10 (accuracy=10000 →
    ≤ 9·N/10000 rows of slack per boundary at 9 cuts), partitions the
    table exactly, and per-decile [min,max] ranges are ordered."""
    from chillastic_spark.queries.analytics4 import balance_deciles_approx

    rows = sorted(
        balance_deciles_approx(spark, SF).collect(), key=lambda r: r["decile"]
    )
    n = sum(r["n_customers"] for r in rows)
    spark_n = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert n == spark_n  # every customer in exactly one decile
    slack = max(2.0, 9 * n / 10_000)
    for r in rows:
        assert abs(r["n_customers"] - n / 10) <= slack + n * 0.01, r
    for a, b in zip(rows, rows[1:]):
        assert a["max_bal"] <= b["min_bal"]  # value-ordered buckets
        assert a["decile"] + 1 == b["decile"]
