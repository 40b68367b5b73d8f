"""Property-based invariants for the bounds planner (hypothesis):
whatever the size distribution, the plan must cover every document
exactly once with sane flush sizes."""
from hypothesis import given, settings, strategies as st

from chillastic_spark.plans import MAX_FLUSH_SIZE, plan_bounds

from test_bounds import ListSizeStats

sizes_strategy = st.lists(
    st.integers(min_value=1, max_value=2_000_000), min_size=0, max_size=400
)


@settings(max_examples=60, deadline=None)
@given(sizes=sizes_strategy, shards=st.integers(min_value=1, max_value=8))
def test_plan_invariants(sizes, shards):
    bounds = plan_bounds(ListSizeStats(sizes, shards=shards))
    assert 1 <= len(bounds) <= 3
    for b in bounds:
        assert 1 <= b.flush_size <= MAX_FLUSH_SIZE

    if len(bounds) == 1 and bounds[0].min_size == -1:
        return  # full-range plan covers everything by definition

    # emitted buckets are ordered and disjoint (empty ones are elided,
    # so the first need not start at 0 — makeBounds filters count>0)
    for prev, nxt in zip(bounds, bounds[1:]):
        assert prev.max_size <= nxt.min_size
    assert bounds[-1].max_size > max(sizes)

    # THE invariant: every document lands in exactly one emitted bucket
    # (a doc in an elided bucket would be silently lost)
    for s in sizes:
        hits = [b for b in bounds if b.min_size <= s < b.max_size]
        assert len(hits) == 1, f"size {s} covered {len(hits)}× by {bounds}"
