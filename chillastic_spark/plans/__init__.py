"""Backlog planning: adaptive size-range partitioning (SURVEY §4.1).

Re-implements the BEHAVIOR of the reference's bounds search
(app/services/subtasks.js:162-361): split each (index, type) into ≤3
``_size`` buckets with comparable chunk counts, where chunk count =
ceil(count / flush_size) and flush_size targets ≈50 MB of bulk payload
per shard. Seed boundaries come from a stats pass (60%/90% points,
1 MB cap); ≤10 refinement iterations of a 3-bucket histogram move the
boundaries by delta-scaled multipliers until chunk counts converge
within 100. Golden outputs are pinned in tests/test_bounds.py
(from tests/services/subtasks.bounds.spec.js:118-231).

Data access is abstracted behind SizeStatsProvider. The DataFrame
provider needs ONE scan for stats and ONE scan per refinement iteration
(conditional-count aggregate) — at 100 TB those scans prune to the
(index,type) partition and read only the size column. A cheaper
single-pass alternative (approx_quantile) is provided for planners that
don't need golden-exact boundaries.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chillastic_spark.model import Subtask

MB = 1024 * 1024
TARGET_BULK_BYTES = 50 * MB  # subtasks.js:267
MAX_FLUSH_SIZE = 10_000  # subtasks.js:15
MAX_ITERATIONS = 10  # subtasks.js:358
CLOSE_ENOUGH_CHUNKS = 100  # subtasks.js:191


@dataclass(frozen=True)
class Bound:
    min_size: float
    max_size: float
    flush_size: int


@dataclass(frozen=True)
class _Bucket:
    count: int
    flush_size: int
    chunks: int
    min_size: float
    max_size: float


class SizeStatsProvider(Protocol):
    shards: int

    def stats(self) -> tuple[int, float, float]:
        """(count, min, max) of the size field."""

    def histogram3(self, b0: float, b1: float, b2: float) -> tuple[int, int, int, int]:
        """(total, n[0,b0), n[b0,b1), n[b1,b2))."""


class DataFrameSizeStats:
    """Size stats over an envelope DataFrame slice."""

    def __init__(self, df: DataFrame, size_col: str = "_size", shards: int = 1):
        # NULL size counts as 0 so unsized docs are planned (and later
        # scanned) into the lowest bucket instead of silently dropped
        self._df = df.select(F.coalesce(F.col(size_col), F.lit(0)).alias("s"))
        self.shards = shards

    def stats(self) -> tuple[int, float, float]:
        row = self._df.agg(
            F.count("*").alias("c"), F.min("s").alias("mn"), F.max("s").alias("mx")
        ).collect()[0]
        return int(row["c"]), float(row["mn"] or 0), float(row["mx"] or 0)

    def histogram3(self, b0: float, b1: float, b2: float):
        row = self._df.agg(
            F.count("*").alias("t"),
            F.sum(((F.col("s") >= 0) & (F.col("s") < b0)).cast("long")).alias("c1"),
            F.sum(((F.col("s") >= b0) & (F.col("s") < b1)).cast("long")).alias("c2"),
            F.sum(((F.col("s") >= b1) & (F.col("s") < b2)).cast("long")).alias("c3"),
        ).collect()[0]
        return (
            int(row["t"]),
            int(row["c1"] or 0),
            int(row["c2"] or 0),
            int(row["c3"] or 0),
        )


def flush_size_for(max_size: float, shards: int) -> int:
    """clamp(50MB / ((maxDocBytes−1)·shards), 1, 10000)  (subtasks.js:267)."""
    denom = (max_size - 1) * shards
    if denom <= 0:
        return MAX_FLUSH_SIZE
    return max(1, min(MAX_FLUSH_SIZE, math.floor(TARGET_BULK_BYTES / denom)))


def initial_bounds(count: int, lower: float, upper_exclusive: float) -> list[float]:
    """Seed boundaries from stats (subtasks.js:210-237): 60%/90% points
    of [min, max+1), second boundary capped at 1 MB."""
    upper = upper_exclusive
    if count == 0:
        return [0, 0, 0]
    if lower + 1 == upper:
        return [upper, upper, upper]
    piece = max(1, math.floor((upper - lower) / 10))
    b1 = 6 * piece + lower
    b2 = 9 * piece + lower
    if upper > MB:
        b2 = MB
    if b1 > b2:
        b1 = math.floor(b2 / 2)
    return [b1, b2, upper]


def _multiplier(lhs: _Bucket, rhs: _Bucket) -> float:
    """Delta-scaled boundary step (subtasks.js:194-209)."""
    delta = abs(lhs.chunks - rhs.chunks)
    for limit, m in ((200, 1.1), (500, 2), (1000, 3), (4000, 5), (10000, 8)):
        if delta < limit:
            return m
    return 10


def _close(lhs: _Bucket, rhs: _Bucket) -> bool:
    return abs(lhs.chunks - rhs.chunks) < CLOSE_ENOUGH_CHUNKS


def _inc(v: float, m: float) -> float:
    return math.ceil(v * m)


def _dec(v: float, m: float) -> float:
    return math.floor(v / m)


def calculate_bounds(
    provider: SizeStatsProvider,
    bounds: list[float],
    max_iterations: int = MAX_ITERATIONS,
) -> list[Bound]:
    """Iterative 3-bucket refinement (subtasks.js:238-351).

    Each iteration: histogram over [0,b0),[b0,b1),[b1,b2) → per-bucket
    flush/chunks → either converge (all pairwise chunk deltas < 100),
    give up (iteration cap / degenerate), or move b0/b1 by the
    delta-scaled multiplier toward balance and recurse.
    """
    default = [Bound(-1, -1, Subtask.DEFAULT_FLUSH_SIZE)]
    shards = provider.shards

    for i in range(max_iterations + 1):
        total, c1, c2, c3 = provider.histogram3(*bounds)
        if total == 0 or total > c1 + c2 + c3:
            return default
        edges = [(0.0, bounds[0]), (bounds[0], bounds[1]), (bounds[1], bounds[2])]
        buckets = []
        for count, (lo, hi) in zip((c1, c2, c3), edges):
            fs = flush_size_for(hi, shards)
            buckets.append(
                _Bucket(count, fs, math.ceil(count / fs), lo, hi)
            )
        b1_, b2_, b3_ = buckets

        def make_bounds() -> list[Bound]:
            return [
                Bound(b.min_size, b.max_size, b.flush_size)
                for b in buckets
                if b.count > 0
            ]

        if b1_.max_size == b2_.max_size == b3_.max_size:
            # degenerate single-point distribution (or empty seed)
            fs = (
                Subtask.DEFAULT_FLUSH_SIZE if b1_.max_size == 0 else b1_.flush_size
            )
            return [Bound(-1, -1, fs)]
        if i >= max_iterations:
            return make_bounds()

        min_bound2 = min(MB, b3_.max_size / 2)
        bound1, bound2 = b1_.max_size, b2_.max_size
        if _close(b1_, b2_) and _close(b2_, b3_):
            return make_bounds()
        elif _close(b1_, b2_):
            m = _multiplier(b2_, b3_)
            f = _dec if b2_.chunks > b3_.chunks else _inc
            bound1, bound2 = f(b1_.max_size, m), f(b2_.max_size, m)
        elif _close(b2_, b3_):
            if bound2 == min_bound2:
                return make_bounds()
            m = _multiplier(b1_, b2_)
            f = _dec if b1_.chunks > b2_.chunks else _inc
            bound1, bound2 = f(b1_.max_size, m), f(b2_.max_size, m)
        else:
            m1, m2 = _multiplier(b1_, b2_), _multiplier(b2_, b3_)
            if bound2 == min_bound2:
                if b1_.chunks < b2_.chunks * 10:
                    bound1 = _inc(b1_.max_size, m1)
                else:
                    return make_bounds()
            elif b1_.chunks < b2_.chunks and b2_.chunks < b3_.chunks:
                bound1, bound2 = _inc(b1_.max_size, m1), _inc(b2_.max_size, m2)
            elif b1_.chunks > b2_.chunks and b2_.chunks > b3_.chunks:
                bound1, bound2 = _dec(b1_.max_size, m1), _dec(b2_.max_size, m2)
            elif b1_.chunks < b2_.chunks and b2_.chunks > b3_.chunks:
                bound1, bound2 = _inc(b1_.max_size, m1), _dec(b2_.max_size, m2)
            elif b1_.chunks > b2_.chunks and b2_.chunks < b3_.chunks:
                bound1, bound2 = _dec(b1_.max_size, m1), _inc(b2_.max_size, m2)

        bound2 = max(min_bound2, bound2)
        if bound1 > bound2:
            bound1 = bound2 / 2
        bounds = [bound1, bound2, b3_.max_size]
    return default  # unreachable


def plan_bounds(provider: SizeStatsProvider) -> list[Bound]:
    """stats → seed → refine (the per-(index,type) planning entry)."""
    count, lower, upper = provider.stats()
    seed = initial_bounds(count, lower, upper + 1)
    return calculate_bounds(provider, seed)


def approx_plan_bounds(
    df: DataFrame, size_col: str = "_size", shards: int = 1, rel_err: float = 0.01
) -> list[Bound]:
    """Single-pass alternative: approx quantiles at 60%/90% replace the
    whole iterative search (SURVEY §4.1 recommendation). Not golden-
    exact; preferred at very large scale (ONE Greenwald-Khanna pass —
    the empty-input guard reads the quantile result instead of paying
    a second full count() scan)."""
    # NULL _size → 0, matching DataFrameSizeStats: approxQuantile
    # IGNORES nulls, and an index of all-unsized docs would return []
    # and crash the unpack even though rows exist
    df = df.withColumn(size_col, F.coalesce(F.col(size_col), F.lit(0)))
    q = df.approxQuantile(size_col, [0.6, 0.9, 1.0], rel_err)
    if not q:  # empty input: approxQuantile saw no values
        return [Bound(-1, -1, Subtask.DEFAULT_FLUSH_SIZE)]
    q60, q90, mx = q
    upper = mx + 1
    b1, b2 = q60, min(q90, MB) if upper > MB else q90
    if b1 > b2:
        # same inversion guard as initial_bounds: capping b2 at 1 MB
        # can push it BELOW q60, and edges (0,q60),(b2,upper) would
        # then double-cover [b2, q60) — overlapping subtasks scan and
        # transfer those docs twice
        b1 = math.floor(b2 / 2)
    edges = [(0.0, b1), (b1, b2), (b2, upper)]
    return [
        Bound(lo, hi, flush_size_for(hi, shards))
        for lo, hi in edges
        if hi > lo
    ]


def formatted_plan(df) -> str:
    """Formatted physical plan of a DataFrame — the ONE explain
    incantation shared by the plan-shape tests and the PLANS.md dump,
    so the audited artifact and the asserted plans can never use
    different explain modes."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
