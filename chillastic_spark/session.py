"""SparkSession factory tuned for this engine.

Defaults target local[32] testing but the settings are the ones we
would ship on a 1000-executor cluster: AQE on (runtime re-planning,
skew-join splitting, partition coalescing), Arrow for the few Pandas
UDF paths, broadcast threshold sized for dimension tables.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def resolve_master(
    env: "dict[str, str] | os._Environ" = os.environ,
    cpus: str | int | None = None,
) -> "tuple[str, str]":
    """(master, cpus) from the environment: SPARK_GRAFT_MASTER
    overrides the local[] default (e.g. yarn, spark://host:7077) for
    ``python -m chillastic_spark`` on a cluster; SPARK_GRAFT_CPUS
    sizes local[] and the shuffle-partition default. Pure so the rule
    is unit-testable without touching a JVM."""
    cpus = str(cpus or env.get("SPARK_GRAFT_CPUS", "32"))
    return env.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"), cpus


def shuffle_partitions_for(cpus: "str | int") -> str:
    """Shuffle-partition default from the cpus setting. Pure so the
    rule is unit-testable: SPARK_GRAFT_CPUS can legitimately be ``*``
    (local[*]) — that is not a partition count, so fall back to the
    machine's cores instead of building a session whose FIRST shuffle
    throws a NumberFormatException deep inside Spark."""
    s = str(cpus)
    return s if s.isdigit() else str(os.cpu_count() or 8)


def get_spark(app_name: str = "chillastic-spark", cpus: str | int | None = None) -> SparkSession:
    # an already-active session (spark-submit on a cluster, a notebook)
    # wins outright — never override its master with local[]
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    master, cpus = resolve_master(cpus=cpus)
    # make the package importable on local-mode Python workers even when
    # the driver script runs from another directory (on a cluster, ship
    # the package with --py-files / pip instead)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # One shuffle partition per core locally; on a real cluster AQE
        # coalesces from a higher initial number, so set both.
        .config("spark.sql.shuffle.partitions", shuffle_partitions_for(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # per-executor heap for multi-JVM masters (local-cluster /
        # standalone); local[] ignores it — executors live in the
        # driver JVM there
        .config(
            "spark.executor.memory",
            os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "3g"),
        )
        # multi-JVM masters spawn Python workers from the EXECUTOR
        # process, whose inherited env decides what those workers can
        # import — pin the package root explicitly rather than hoping
        # the driver's PYTHONPATH propagated through the worker launch
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.environ.get("PYTHONPATH", pkg_root),
        )
        # retrying search/scroll (reference transfer.js:79-87) → Spark
        # task retries; no-op on local[] but the shipped default
        .config("spark.task.maxFailures", "4")
        # reclaim reliable-checkpoint files (persist.materialize mode
        # 'reliable') once their frames are unreferenced — required for
        # long-running streams that checkpoint per micro-batch
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # keep managed tables (bucketing helpers) out of the repo cwd
        .config("spark.sql.warehouse.dir", "/tmp/chillastic-warehouse")
    )
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tunings to an externally provided session
    (the driver hands us one in ``__spark_entry__.entry``)."""
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this session; fine
    return spark

def calibrate(spark: SparkSession) -> float:
    """Fixed machine-speed probe, independent of the code under test:
    one 20M-row shuffle+agg, returning wall seconds. Both harnesses
    (bench.py and scripts/check.py) emit it so cross-round comparisons
    can be de-noised mechanically — a loaded sandbox inflates the probe
    the same way it inflates the queries (r5 verdict #9)."""
    import time

    from pyspark.sql import functions as F

    t = time.time()
    (
        spark.range(0, 20_000_000, 1, 32)
        .groupBy((F.col("id") % 97).alias("k"))
        .agg(F.sum("id"))
        .count()
    )
    return time.time() - t
