"""Binned interval join — the scalable no-equi-key range join.

A naive ``l.ts BETWEEN r.start AND r.end`` join has no equi key, so
Spark plans BroadcastNestedLoopJoin (driver-OOM / O(n·m) at scale).
The standard fix: discretise time into fixed bins, explode each
interval over the bins it covers, give each point its single bin, and
equi-join on the bin — Catalyst gets a plain shuffled hash join, and
the residual range predicate filters within matched bins.

Each (point, interval) match surfaces EXACTLY once (a point has one
bin), so no post-dedup is needed. Interval row count inflates by its
bin span — pick ``unit`` so typical intervals cover few bins (the
usual heuristic: bin ≈ median interval length).

Reference parity note: the reference engine has no joins at all
(SURVEY §2.3); this operator belongs to the extended analytics
surface, composed from DataFrame primitives only.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS = frozenset({"minute", "hour", "day"})


def bin_interval_join(
    points: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``start <= ts < end`` via bin equi-join (columns of both inputs
    are preserved; name-collisions must be resolved by the caller).
    """
    if unit not in _UNITS:
        raise ValueError(f"unsupported bin unit: {unit!r}")
    for side, cols in (("points", points.columns), ("intervals", intervals.columns)):
        if "__bin" in cols:
            raise ValueError(f"{side} already has a __bin column")
    step = F.expr(f"INTERVAL 1 {unit}")
    p = points.withColumn("__bin", F.date_trunc(unit, F.col(ts_col)))
    # empty/inverted intervals ([t, t) or end < start) match nothing —
    # filter them out rather than letting F.sequence abort the job on
    # illegal (start > stop) boundaries
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    # bins covered by [start, end): trunc(start) .. trunc(end - 1µs)
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.date_trunc(unit, F.col(start_col)),
                F.date_trunc(
                    unit, F.col(end_col) - F.expr("INTERVAL 1 microsecond")
                ),
                step,
            )
        ),
    )
    return (
        p.join(i, "__bin")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bin")
    )
