"""As-of join: for each left row, the latest right row at or before its
timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/QuestDB do). The scalable
formulation is NOT a range join (which Catalyst would nested-loop):
union both sides tagged, sort within each key partition once, and carry
the last-seen right value forward with ``last(..., ignorenulls=True)``
over an unbounded-preceding window. One shuffle on the key, no
row-pair blowup, skew handled by AQE.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    order_tiebreak: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Return ``left`` with ``value_cols`` from the latest ``right`` row
    whose ``ts`` ≤ left.ts (< when ``strict``), matched per ``key``.

    Right rows sort before left rows at equal timestamps unless
    ``strict`` (then after), so equality matches are in/excluded
    deterministically.

    NULL keys never match (a NULL-key left row carries NULL values),
    mirroring every SQL/ASOF equi-join — Window.partitionBy would
    otherwise group all NULL keys into one partition and match them to
    each other. NULL timestamps never match EITHER SIDE (three-valued
    logic: NULL <= x is unknown): a NULL-ts right row is dropped, a
    NULL-ts left row carries NULL values. Note DuckDB's sort-based
    ASOF JOIN diverges on the left case only — it sorts NULL ts last
    and matches it to the key's LATEST right row (NULL as +infinity);
    tests/test_asof_nulls.py pins both behaviors explicitly.

    ``order_tiebreak`` (when the column exists on ``right``) picks
    among duplicate right rows at the same (key, ts): ascending order,
    the largest value wins — ahead of the value-struct hash, which
    remains the final deterministic fallback. On left-only columns it
    cannot affect results (side precedence fully orders left vs right);
    a column on neither side raises.
    """
    # helper-column collision guard (same contract as
    # interval.bin_interval_join's __bin): silently overwriting and
    # then dropping a caller's column would lose user data
    reserved = {"__side", "__vals", "__asof_vals"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)}; rename "
            f"{sorted(clash)} before joining"
        )
    # a value_col sharing a name with a LEFT column would be silently
    # dropped and replaced by the matched right value — the exact
    # lose-caller-data failure the reserved-name guard above exists
    # for. pandas merge_asof suffixes such collisions; here the caller
    # must rename (an implicit suffix would silently change the output
    # schema contract 'left columns plus value_cols').
    overwritten = set(value_cols) & set(left.columns)
    if overwritten:
        raise ValueError(
            f"asof_join value_cols {sorted(overwritten)} collide with "
            "left columns — rename one side (the left data would be "
            "silently replaced by the matched right values)"
        )
    # Right values travel as ONE struct so every carried column comes
    # from the SAME matched row — carrying columns independently with
    # last(ignorenulls) would backfill a NULL field of the true match
    # from an older row (a composite row no real ASOF JOIN produces).
    if order_tiebreak and (
        order_tiebreak not in set(left.columns) | set(right.columns)
    ):
        raise ValueError(
            f"order_tiebreak column {order_tiebreak!r} exists on neither side"
        )
    value_schema = right.select(*value_cols).schema
    lt = left.withColumn("__side", F.lit(1)).withColumn(
        "__vals", F.lit(None).cast(value_schema)
    )
    # carry the tiebreak from the RIGHT side when it lives there —
    # selecting only key/ts/__vals used to drop it, making the
    # parameter a silent no-op for its one real purpose (choosing
    # among duplicate right rows)
    rt_tiebreak = (
        [F.col(order_tiebreak)]
        if order_tiebreak and order_tiebreak in right.columns
        else []
    )
    rt = right.select(
        key,
        ts,
        *rt_tiebreak,
        F.struct(*[F.col(c) for c in value_cols]).alias("__vals"),
    ).withColumn("__side", F.lit(0 if not strict else 2))
    # NULL-key right rows can never be anyone's match; dropping them
    # pins NULL != NULL semantics (NULL-key left rows then share a
    # partition containing no right rows and carry NULL naturally).
    # NULL-ts right rows can never satisfy ts <= left.ts either — but
    # NULLS-FIRST ordering would sort them before EVERY left row and
    # last() would carry their values as matches at -infinity, so they
    # must be dropped too (DuckDB's ASOF JOIN predicate never matches
    # a NULL timestamp). NULL-ts LEFT rows sort first in their key
    # partition, see no preceding right row, and carry NULL naturally.
    rt = rt.filter(F.col(key).isNotNull() & F.col(ts).isNotNull())
    u = lt.unionByName(rt, allowMissingColumns=True)

    # side precedence must dominate any user tiebreak: a tiebreak
    # sorted BEFORE __side would put right rows (NULL tiebreak,
    # nulls-first) ahead of left rows at equal timestamps, silently
    # re-including the equal-ts matches ``strict`` exists to exclude.
    # The value-struct hash is the FINAL component so duplicate right
    # rows at the same (key, ts) carry one deterministic winner
    # (highest hash) instead of whichever row the shuffle ordered last.
    order = [F.col(ts).asc(), F.col("__side").asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc_nulls_first())
    order.append(F.xxhash64(F.col("__vals")).asc_nulls_first())
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = u.select(
        "*",
        F.last(
            F.when(F.col("__side") != 1, F.col("__vals")), ignorenulls=True
        ).over(w).alias("__asof_vals"),
    )
    out = carried.filter(F.col("__side") == 1)
    for c in value_cols:
        out = out.drop(c).withColumn(c, F.col(f"__asof_vals.{c}"))
    out = out.drop("__side", "__vals", "__asof_vals")
    if (
        rt_tiebreak
        and order_tiebreak not in left.columns
        and order_tiebreak not in value_cols  # carried as a value: keep
    ):
        # a RIGHT-only tiebreak column rode the union for ordering; on
        # left rows it is always NULL and is not part of the documented
        # output (left columns plus value_cols) — dropping it keeps
        # strict selects/unionByName downstream from meeting a junk
        # all-NULL column
        out = out.drop(order_tiebreak)
    return out
