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


def all_queries() -> dict[str, Query]:
    from chillastic_spark.queries import (
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
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
        search,
        search2,
        search3,
    ):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
