"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check on sf0.001
queries()    — name → (spark, sf_dir) -> DataFrame, one per operator
oracle_sql() — name → equivalent duckdb SQL (omitted for the few
               non-SQL-expressible approximate ops → rows-only check)

Implementation lives in chillastic_spark/ (see SURVEY.md §7).
"""
from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _tuned(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from chillastic_spark.session import tune_session

        return fn(tune_session(spark), sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from chillastic_spark.queries.relational import q1_pricing_summary
    from chillastic_spark.session import tune_session

    return q1_pricing_summary(tune_session(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from chillastic_spark.queries import all_queries

    return {name: _tuned(q.fn) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from chillastic_spark.queries import all_queries

    return {name: q.sql for name, q in all_queries().items() if q.sql is not None}
