"""Golden tests for the adaptive bounds planner — exact expected values
from the reference suite (tests/services/subtasks.bounds.spec.js:118-231,
recorded in BASELINE.md). Pure-Python provider: the algorithm is
driver-side math; only the stats/histogram touch data.
"""
import pytest

from chillastic_spark.model import Subtask
from chillastic_spark.plans import (
    Bound,
    DataFrameSizeStats,
    approx_plan_bounds,
    calculate_bounds,
    flush_size_for,
    initial_bounds,
    plan_bounds,
)


class ListSizeStats:
    def __init__(self, sizes, shards=1):
        self.sizes = sizes
        self.shards = shards

    def stats(self):
        if not self.sizes:
            return 0, 0, 0
        return len(self.sizes), min(self.sizes), max(self.sizes)

    def histogram3(self, b0, b1, b2):
        c1 = sum(1 for s in self.sizes if 0 <= s < b0)
        c2 = sum(1 for s in self.sizes if b0 <= s < b1)
        c3 = sum(1 for s in self.sizes if b1 <= s < b2)
        return len(self.sizes), c1, c2, c3


def KB(n):
    return int(n * 1024)


def corpus_10kb():
    sizes = [1 + (i % 1023) for i in range(10_000)]           # [1B, 1KB)
    sizes += [7168 + (i % 1024) for i in range(1_000)]        # [7KB, 8KB)
    sizes += [9421 + (i % 819) for i in range(10_000)]        # [9.2KB, 10KB)
    sizes += [KB(6), KB(9), KB(10)]                           # exact marks
    return sizes


def test_no_records():
    assert plan_bounds(ListSizeStats([])) == [
        Bound(-1, -1, Subtask.DEFAULT_FLUSH_SIZE)
    ]


def test_all_same_size():
    # spec: 100 docs × 100 B → single full-range bound, flush maxed
    assert plan_bounds(ListSizeStats([100] * 100)) == [Bound(-1, -1, 10_000)]


def test_nothing_above_1kb():
    sizes = [1 + (i % 1023) for i in range(20_000)] + [KB(1)]
    assert plan_bounds(ListSizeStats(sizes)) == [
        Bound(0, 613, 10_000),
        Bound(613, 919, 10_000),
        Bound(919, KB(1) + 1, 10_000),
    ]


def test_nothing_above_10kb_1_shard():
    assert plan_bounds(ListSizeStats(corpus_10kb())) == [
        Bound(0, 6145, 8533),
        Bound(6145, 9217, 5688),
        Bound(9217, KB(10) + 1, 5120),
    ]


def test_nothing_above_10kb_4_shards():
    assert plan_bounds(ListSizeStats(corpus_10kb(), shards=4)) == [
        Bound(0, 6145, 2133),
        Bound(6145, 9217, 1422),
        Bound(9217, KB(10) + 1, 1280),
    ]


@pytest.mark.parametrize("big_max", [50, 500])
def test_long_tail_mb(big_max):
    MB1 = 1024 * 1024
    top = big_max * MB1
    sizes = [20 + (i % 10220) for i in range(10_000)]
    sizes += [10240 + (i % 194560) for i in range(250_000)]
    sizes += [20 * MB1 + i * ((top - 20 * MB1) // 100) for i in range(100)]
    sizes += [top]
    got = plan_bounds(ListSizeStats(sizes))
    assert got == [Bound(0, 524288, 100), Bound(MB1, top + 1, 1)]


def test_initial_bounds_formula():
    # subtasks.js:210-237: piece=(u-l)/10 → 60%/90% points; 1MB cap
    assert initial_bounds(0, 0, 0) == [0, 0, 0]
    assert initial_bounds(10, 99, 100) == [100, 100, 100]
    assert initial_bounds(100, 0, 1000) == [600, 900, 1000]
    b = initial_bounds(100, 0, 10 * 1024 * 1024)
    assert b[1] == 1024 * 1024 and b[0] == 524288


def test_flush_size_formula():
    # clamp(50MB/((max−1)·shards), 1, 10000)   (subtasks.js:267)
    assert flush_size_for(10241, 1) == 5120
    assert flush_size_for(10241, 4) == 1280
    assert flush_size_for(2, 1) == 10_000
    assert flush_size_for(52428801, 1) == 1


def test_dataframe_provider_matches_list(spark):
    sizes = corpus_10kb()
    df = spark.createDataFrame([(s,) for s in sizes], "_size: long")
    got = plan_bounds(DataFrameSizeStats(df))
    assert got == plan_bounds(ListSizeStats(sizes))


def test_approx_plan_is_sane(spark):
    df = spark.createDataFrame([(s,) for s in corpus_10kb()], "_size: long")
    bounds = approx_plan_bounds(df)
    assert 1 <= len(bounds) <= 3
    assert bounds[-1].max_size > KB(10)  # covers the max
    for b in bounds:
        assert 1 <= b.flush_size <= 10_000


def test_approx_bounds_disjoint_when_q60_exceeds_1mb(spark):
    """Capping the second boundary at 1 MB can push it below q60; the
    edges must never double-cover a size range (overlapping subtasks
    would transfer those docs twice)."""
    from chillastic_spark.plans import approx_plan_bounds

    df = spark.range(100).selectExpr("(2000000 + id * 10000) as _size")
    bounds = approx_plan_bounds(df)
    bs = sorted((b.min_size, b.max_size) for b in bounds)
    for (lo1, hi1), (lo2, hi2) in zip(bs, bs[1:]):
        assert hi1 <= lo2, bs  # disjoint
    assert bs[0][0] == 0.0
    assert bs[-1][1] > 2_990_000  # covers the max
