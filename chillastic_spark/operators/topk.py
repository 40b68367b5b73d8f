"""Window-free global top-k ranking (the 100 TB-safe search-ranking shape).

A global ``Window.orderBy(...)`` + ``row_number`` forces the ENTIRE
input through one task — fine at test scale, a serialization point at
corpus scale. The Spark-native shape is ``orderBy().limit(k)``
(TakeOrderedAndProject: every partition computes a local top-k in
parallel, the driver merges P·k candidate rows), then ranks are derived
on the ≤k survivors with a single-row collect_list → array_sort →
posexplode — no WindowExec anywhere in the plan, and nothing larger
than k rows ever flows through one task. ``tests/test_plan_shapes.py``
pins both properties for every consumer.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _desc_key(score: str, id_col: str) -> F.Column:
    """Sort-key struct whose ascending order equals
    ``orderBy(score desc, id asc)`` including Spark's desc null/NaN
    placement (NaN first, finite by score desc, NULL last). The
    original score rides along as ``_s`` so callers emit it verbatim
    (negating a key would turn NULL into NULL but also NaN into NaN —
    fine — yet could not restore a null's position)."""
    c = F.col(score)
    klass = (
        F.when(c.isNull(), F.lit(2))
        .when(F.isnan(c), F.lit(0))
        .otherwise(F.lit(1))
        .cast("int")
    )
    ns = F.when(c.isNull() | F.isnan(c), F.lit(0.0)).otherwise(-c)
    return F.struct(
        klass.alias("_k"),
        ns.alias("_ns"),
        F.col(id_col).alias("_id"),
        c.alias("_s"),
    )


def ranked_topk(
    df: DataFrame, score: str, id_col: str, k: int, rank_name: str = "rank"
) -> DataFrame:
    """Top-``k`` of ``df`` by (``score`` desc, ``id_col`` asc) with a
    1-based dense position column ``rank_name``.

    Returns columns ``(rank_name, id_col, score)``. Deterministic: the
    rank is the row's position under the exact (score desc, id asc)
    total order, independent of partitioning.
    """
    top = df.orderBy(F.desc(score), F.asc(id_col)).limit(k)
    # rank the ≤k survivors in-plan with a key whose ASCENDING struct
    # order replicates orderBy(desc) exactly, INCLUDING the null/NaN
    # rules (desc = NaN first, finite desc, nulls last): a bare
    # negated score would instead sort null scores FIRST and NaN last,
    # handing rank 1 to a null-score row the limit ranked dead last.
    packed = top.agg(
        F.array_sort(F.collect_list(_desc_key(score, id_col))).alias("_a")
    )
    return packed.select(F.posexplode("_a").alias("_r", "_x")).select(
        (F.col("_r") + 1).alias(rank_name),
        F.col("_x._id").alias(id_col),
        F.col("_x._s").alias(score),
    )


def last_of_topk(df: DataFrame, score: str, id_col: str, k: int) -> DataFrame:
    """The k-th row under (``score`` desc, ``id_col`` asc) as a 1-row
    DataFrame ``(cur_score, cur_id)`` — the keyset-pagination cursor,
    without a global window. Empty input yields one all-NULL row.

    CONTRACT: the score column must be non-null on every row. A NULL
    score in the k-th position yields cur_score = NULL, and the
    standard keyset predicate (``s < cur OR (s = cur AND id > cur_id)``)
    is NULL for every remaining row — pagination would silently stop
    with rows left. All in-repo scores are aggregates over matches
    (never NULL); filter or coalesce scores before paginating anything
    nullable."""
    top = df.orderBy(F.desc(score), F.asc(id_col)).limit(k)
    # the order-k row is the struct-max of the desc-order key (same
    # null/NaN-consistent key as ranked_topk) over the top-k
    return top.agg(F.max(_desc_key(score, id_col)).alias("_c")).select(
        F.col("_c._s").alias("cur_score"), F.col("_c._id").alias("cur_id")
    )
