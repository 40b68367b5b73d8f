"""Iterative checkpoints must not inherit (and therefore compound) the
origin plan's size statistics.

Dataset.checkpoint/localCheckpoint copy the optimized plan's
``sizeInBytes`` onto the produced LogicalRDD. Inside a fixpoint loop
every round's joins multiply their children's estimates, the checkpoint
carries the product forward, and the estimate grows doubly
exponentially: measured live at sf0.1 (r10), round 5 of
connected_components carried a >4300-digit BigInt and the driver spent
minutes per round in BigInteger.multiply inside the stats visitor.
``materialize(iterative=True)`` therefore rebuilds the frame over its
own RDD (persist._reset_stats), which reports the constant default
leaf estimate instead.
"""
from pyspark.sql import functions as F

from chillastic_spark.persist import materialize, release


def _size_digits(df) -> int:
    return len(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def test_iterative_checkpoint_stats_stay_flat(spark):
    df = spark.range(200).select(F.col("id").alias("k"), F.col("id").alias("v"))
    pins = []
    digits = []
    cur = df
    for _ in range(4):
        left = cur.select(F.col("k"), (F.col("v") + 1).alias("v"))
        right = cur.select(F.col("k").alias("k2"), F.col("v").alias("v2"))
        cur = (
            left.join(right, left["k"] == right["k2"])
            .join(right.withColumnRenamed("k2", "k3"), left["k"] == F.col("k3"))
            .select("k", "v")
        )
        cur = materialize(cur, iterative=True)
        pins.append(cur)
        digits.append(_size_digits(cur))
    # joins multiply estimates; without the reset the checkpointed
    # estimate compounds round over round (hundreds of digits by round
    # 4). With the reset every round reports the constant default leaf
    # estimate (Long.MaxValue = 19 digits).
    assert max(digits) <= 19, f"stats compounding across rounds: {digits}"
    assert digits[0] == digits[-1], f"stats not constant: {digits}"
    for p in pins:
        release(p)


def test_iterative_checkpoint_result_and_release_delegate(spark):
    df = spark.range(50).select(F.col("id").alias("k"))
    pinned = materialize(df.select((F.col("k") * 2).alias("k")), iterative=True)
    # the rebuilt frame computes the same rows
    assert sorted(r["k"] for r in pinned.collect()) == [2 * i for i in range(50)]
    # release must reach the underlying checkpoint through the delegate
    assert getattr(pinned, "_chillastic_release_delegate", None) is not None
    release(pinned)  # must not raise; frees the delegate's blocks
