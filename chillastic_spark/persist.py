"""Shared materialization policy for multi-consumer intermediates and
iterative-operator round state.

One knob controls how EVERY operator pins a DataFrame it will consume
more than once (dedup shingle/signature tables, LM token streams,
drift references) or re-derive across rounds (PageRank ranks, label
propagation labels, BPE vocab rewrites, connected-components edges):

``local`` (default)
    ``localCheckpoint()`` — fastest on one machine, cuts lineage, but
    stores blocks on the executors that computed them with NO
    recomputation path: on a real cluster one executor loss
    mid-iteration kills the job. The local[32] / single-node setting.
``reliable``
    ``DataFrame.checkpoint()`` — writes to the SparkContext checkpoint
    directory (HDFS/S3 on a cluster), cuts lineage AND survives
    executor loss. THE cluster setting for iterative operators. The
    checkpoint dir is taken from the session if already set, else from
    ``CHILLASTIC_CHECKPOINT_DIR``, else a process-local temp dir (fine
    locally; on a cluster set the env to a shared filesystem).
``disk``
    ``persist(StorageLevel.DISK_ONLY)`` — executor-local blocks with
    the lineage retained, so a lost block recomputes. Right for
    ONE-SHOT intermediates at cluster scale; does NOT cut lineage, so
    iterative callers escalate (see below).
``none``
    no-op — recompute per consumer. Cheapest memory; pays the upstream
    pass once per consumer. Iterative callers escalate.

Env: ``CHILLASTIC_PERSIST`` ∈ {local, reliable, disk, none}
(``CHILLASTIC_DEDUP_PERSIST`` honoured as a back-compat alias; read at
CALL time so tests and drivers can flip it without re-imports).

Iterative escalation: an operator whose per-round plan references the
previous round's output MUST cut lineage every round — under ``disk``
or ``none`` the analysis plan grows with the round count (pathological
for BPE's hundreds of merges) and a replay recomputes the whole
history. Such callers pass ``iterative=True``: ``disk``/``none`` then
escalate to ``reliable``, keeping the one-knob contract (the cluster
modes stay executor-loss-safe) without letting a dedup-oriented
setting break fixpoint loops.
"""
from __future__ import annotations

import contextlib
import os
import tempfile
import threading

from pyspark.sql import DataFrame

_VALID = ("local", "reliable", "disk", "none")
_SCOPES = threading.local()


def persist_mode() -> str:
    """The configured mode, read from the environment at call time."""
    mode = os.environ.get(
        "CHILLASTIC_PERSIST",
        os.environ.get("CHILLASTIC_DEDUP_PERSIST", "local"),
    )
    if mode not in _VALID:
        raise ValueError(
            f"unknown persist mode {mode!r}; expected one of {_VALID}"
        )
    return mode


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(
            os.environ.get("CHILLASTIC_CHECKPOINT_DIR")
            or tempfile.mkdtemp(prefix="chillastic-ckpt-")
        )


def _reset_stats(out: DataFrame) -> DataFrame:
    """Rebuild a checkpointed frame over its own RDD so it does NOT
    inherit the parent plan's size statistics.

    Dataset.checkpoint/localCheckpoint preserve the ORIGIN plan's
    ``sizeInBytes`` estimate on the LogicalRDD. Inside a fixpoint loop
    that estimate COMPOUNDS: every join multiplies its children's
    estimates, the per-round checkpoint carries the product into the
    next round, and after k rounds the estimate is a
    doubly-exponential BigInt. Measured live on the sf0.1 embedding
    pair graph (r10 round): by round 5 the checkpoint's sizeInBytes
    exceeded 4300 DIGITS and the driver burned minutes per round in
    BigInteger.multiply inside SizeInBytesOnlyStatsPlanVisitor —
    25s/173s for rounds 10/11 of connected-components, and with more
    joins per round (pointer doubling) the blowup came even earlier.

    The rebuilt LogicalRDD reports the default leaf estimate
    (spark.sql.defaultSizeInBytes = Long.MaxValue), which (a) stays
    CONSTANT across rounds — planning cost is flat forever — and
    (b) only disables estimate-based auto-broadcast of round state,
    which the compounded garbage estimate disabled anyway; AQE still
    broadcasts from RUNTIME sizes. The original frame rides along as
    ``_chillastic_release_delegate`` so :func:`release` can still
    unpersist the underlying checkpoint blocks (the rebuilt plan's
    RDD is a wrapper; unpersisting it alone frees nothing)."""
    try:
        spark = out.sparkSession
        jdf = out._jdf
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        nd = DataFrame(new_jdf, spark)
        nd._chillastic_release_delegate = out
        return nd
    except Exception:  # noqa: BLE001 — stats reset is an optimization
        return out


def materialize(
    df: DataFrame,
    mode: "str | None" = None,
    iterative: bool = False,
    eager: bool = True,
) -> DataFrame:
    """Pin a multi-consumer or per-round intermediate per the module
    policy (see module docstring). ``iterative=True`` marks round
    state inside a fixpoint loop: modes that retain lineage
    (disk/none) escalate to ``reliable`` so the plan stays flat.

    ``eager=False`` defers the checkpoint to the FIRST downstream
    action instead of running a dedicated materialization job. Use it
    only when the caller runs a single driver-side action on the
    pinned frame before fanning out to multiple consumers — that
    action then doubles as the materialization pass (the hot-gram
    preflight rides this: its stats job IS the checkpoint job, r9
    verdict #5). A lazy pin whose first consumer is a MULTI-branch
    plan may compute overlapping partitions concurrently before the
    cache fills — keep the default for that shape."""
    mode = mode or persist_mode()
    if mode not in _VALID:
        raise ValueError(
            f"unknown persist mode {mode!r}; expected one of {_VALID}"
        )
    if iterative and mode in ("disk", "none"):
        mode = "reliable"
    if mode == "local":
        out = df.localCheckpoint(eager=eager)
        if iterative:
            out = _reset_stats(out)
    elif mode == "reliable":
        _ensure_checkpoint_dir(df)
        out = df.checkpoint(eager=eager)
        if iterative:
            out = _reset_stats(out)
    elif mode == "disk":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
    else:
        return df
    stack = getattr(_SCOPES, "stack", None)
    if stack:
        stack[-1].append(out)
    return out


@contextlib.contextmanager
def batch_scope():
    """Auto-release every ``materialize`` pinned inside the scope —
    including the ones buried in operator INTERNALS (connected
    components' per-round state, lsh pair signatures) that the caller
    never sees and so can never :func:`release` by hand. Streaming
    loops wrap each micro-batch's processing: by scope exit the
    batch's outputs are written, every intermediate is consumed, and
    releasing is safe; nothing accumulates across thousands of
    micro-batches. Thread-local (foreachBatch runs on the streaming
    thread) and re-entrant (inner scopes release only their own)."""
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    frames: "list[DataFrame]" = []
    stack.append(frames)
    try:
        yield frames
    finally:
        stack.pop()
        for f in frames:
            release(f)


def release(df: DataFrame) -> None:
    """Free a ``materialize``d intermediate once its LAST consumer has
    run. Long-running streams materialize per-batch intermediates
    inside ``foreachBatch`` — without an explicit release, ``disk`` /
    ``local`` blocks stay registered in the session cache for every
    batch ever processed, a slow leak over thousands of micro-batches.
    Safe on any mode: unpersist is a no-op for never-persisted frames,
    and reliable-checkpoint files are reclaimed by Spark's context
    cleaner (``spark.cleaner.referenceTracking.cleanCheckpoints``,
    enabled in session.get_spark) once the frame is unreferenced.

    Two layers because the two persist mechanisms register in
    DIFFERENT places: ``DataFrame.unpersist`` only consults the SQL
    cache manager (covers mode ``disk``), while ``localCheckpoint``
    blocks belong to the underlying checkpointed RDD and are tracked
    only in ``sc.persistentRdds`` — they need an RDD-level unpersist
    (reached through the analyzed LogicalRDD) or they linger until
    JVM GC."""
    delegate = getattr(df, "_chillastic_release_delegate", None)
    if delegate is not None:
        release(delegate)
    try:
        df.unpersist(blocking=False)
    except Exception:  # noqa: BLE001 — releasing is best-effort
        pass
    try:
        # mode 'local': the checkpointed RDD behind the LogicalRDD
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — not a LogicalRDD-backed frame
        pass
