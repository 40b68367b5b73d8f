"""Batch 17 (corpus gates + profiler): rule-exercise and plan-shape
tests for gopher_quality_flags, c4_line_filter, and table_profile.

The oracle hash equality itself is covered by scripts/check.py /
the driver gate; these tests pin (a) that every planted rule trigger
actually fires, (b) the 100 TB plan shapes: the two corpus gates are
narrow (zero Exchange), the profiler reads lineitem exactly once.
"""
import pytest

from chillastic_spark.queries import all_queries
from chillastic_spark.queries.analytics9 import table_profile

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    from conftest import plan_of

    return plan_of(spark, all_queries()[name].fn(spark, SF))


@pytest.fixture(scope="module")
def gopher_rows(spark):
    df = all_queries()["gopher_quality_flags"].fn(spark, SF)
    return {r["doc_id"]: r.asDict() for r in df.collect()}


@pytest.fixture(scope="module")
def c4_rows(spark):
    df = all_queries()["c4_line_filter"].fn(spark, SF)
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_gopher_planted_rules_fire(gopher_rows):
    r4 = gopher_rows[4]  # %4: two planted bullet lines
    assert r4["bullet_lines"] == 2 and r4["n_lines"] >= 3
    r6 = gopher_rows[6]  # %6: planted ellipsis line
    assert r6["ellipsis_lines"] >= 1
    r9 = gopher_rows[9]  # %9: planted '## ## ##' run → 3 symbols
    assert r9["symbol_count"] >= 3
    r1 = gopher_rows[1]  # un-planted doc: no lines, no symbols
    assert r1["n_lines"] == 1 and r1["bullet_lines"] == 0


def test_gopher_gate_is_conjunction(gopher_rows):
    flags = [k for k in next(iter(gopher_rows.values())) if k.startswith("flag_")]
    assert len(flags) == 7
    for r in gopher_rows.values():
        assert r["pass_gopher"] == all(r[f] for f in flags)
    # the gate must discriminate: both outcomes occur on the corpus
    outcomes = {r["pass_gopher"] for r in gopher_rows.values()}
    assert outcomes == {True, False}


def test_gopher_symbol_ratio_integer_math(gopher_rows):
    # '## ## ##' planting on %9 docs: short docs (< 10·symbols words)
    # must fail the symbol-ratio flag, long docs pass — both present
    planted = [r for i, r in gopher_rows.items() if i % 9 == 0]
    assert any(not r["flag_symbol_ratio"] for r in planted)


def test_c4_planted_rules_fire(c4_rows):
    # %13: javascript line planted (>= 5 words, ends '.') but dropped
    r13 = c4_rows[13]
    assert r13["n_lines"] >= 2 and r13["n_kept"] < r13["n_lines"]
    # %17: lorem append makes the doc's single line end in '.' → kept,
    # but the doc itself is gated out on 'lorem ipsum'
    r17 = c4_rows[17]
    assert r17["n_kept"] >= 1 and not r17["keep_doc"]
    # %19: '{' gate
    assert not c4_rows[19]["keep_doc"]


def test_c4_empty_clean_is_empty_string_md5(c4_rows):
    import hashlib

    empty_md5 = hashlib.md5(b"").hexdigest()
    empties = [r for r in c4_rows.values() if r["n_kept"] == 0]
    assert empties, "corpus unexpectedly has no fully-filtered docs"
    for r in empties:
        assert r["cleaned_chars"] == 0 and r["cleaned_md5"] == empty_md5
        assert not r["keep_doc"]


def test_corpus_gates_are_narrow(spark):
    # zero Exchange: both gates must stay scan-bound maps at 100 TB
    for name in ("gopher_quality_flags", "c4_line_filter"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"


def test_profile_single_scan(spark):
    plan = _plan(spark, "table_profile")
    # "Scan parquet" appears once in the tree and once in the detail
    # section per scan node — one scan node ⇒ exactly one Location line
    assert plan.count("Location: InMemoryFileIndex") == 1
    # exact distinct via one Expand over that single scan
    assert "Expand" in plan


def test_profile_approx_mode(spark):
    from conftest import plan_of

    df = table_profile(spark, SF, exact=False)
    plan = plan_of(spark, df)
    assert "Expand" not in plan  # approx_count_distinct needs no Expand
    rows = {r["column_name"]: r for r in df.collect()}
    exact = {r["column_name"]: r for r in table_profile(spark, SF).collect()}
    assert rows.keys() == exact.keys()
    for c, r in rows.items():
        e = exact[c]
        assert (r["n_rows"], r["n_nulls"], r["min_value"], r["max_value"]) == (
            e["n_rows"], e["n_nulls"], e["min_value"], e["max_value"]
        )
        # HLL estimate within 10% of truth
        assert abs(r["n_distinct"] - e["n_distinct"]) <= max(2, 0.1 * e["n_distinct"])


def test_profile_null_accounting(spark):
    rows = {r["column_name"]: r for r in table_profile(spark, SF).collect()}
    for c, r in rows.items():
        assert r["n_nulls"] >= 0 and r["n_distinct"] <= r["n_rows"] - r["n_nulls"]
