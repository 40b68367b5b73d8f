"""Scaled-down twin of scripts/soak_kill.py (r7 verdict #5): a REAL
reindex Task over the sf0.01 documents corpus, drained by multiple OS
processes in shared mode, one SIGKILLed mid-transfer, recovered by the
documented build_backlog rebuild, and reconciled DOC-EXACT.

test_locks.py pins the state-layer protocol over synthetic subtasks;
this exercises the full data plane around it (envelope store read →
Spark transfer → bucketed MERGE sink) under the same crash. The
full-size (sf1, 4-worker) run lives in scripts/soak_kill.py with its
evidence committed as SOAK_r{N}.json.
"""
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_INDICES = 8

WORKER_SRC = """
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = "4"
from chillastic_spark.session import get_spark
from chillastic_spark.engine import Engine
spark = get_spark("soak-test-worker")
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, {state!r})
status = eng.run_task("soak", shared=True)
print(json.dumps(status), flush=True)
"""


def _envelope(spark):
    from pyspark.sql import functions as F

    from chillastic_spark.tables import load

    d = load(spark, "/root/testdata/sf0.01", "documents")
    cols = F.struct(*[c for c in d.columns])
    return d.select(
        F.concat(
            F.lit("docs_"),
            F.pmod(F.col("doc_id"), F.lit(N_INDICES)).cast("string"),
        ).alias("_index"),
        F.lit("doc").alias("_type"),
        F.col("doc_id").cast("string").alias("_id"),
        F.to_json(cols).alias("_source"),
        F.length(F.to_json(cols)).cast("long").alias("_size"),
    )


def test_shared_reindex_survives_sigkill_doc_exact(spark, tmp_path):
    from chillastic_spark.engine import Engine, TaskState
    from chillastic_spark.model import Task, TransferSpec
    from chillastic_spark.sources import DocumentStore

    src = DocumentStore(str(tmp_path / "src"))
    env = _envelope(spark)
    names = [f"docs_{i}" for i in range(N_INDICES)]
    for ix in names:
        src.write_documents(env.filter(env["_index"] == ix), ix)
    src.put_indices(
        [
            {
                "name": ix,
                "settings": {"index": {"number_of_shards": 1}},
                "mappings": {"doc": {"properties": {}}},
                "aliases": {},
            }
            for ix in names
        ]
    )
    dst_root = str(tmp_path / "dst")
    DocumentStore(dst_root)
    state_root = str(tmp_path / "state")
    eng = Engine(spark, state_root)
    eng.add_task(
        "soak",
        Task(
            source=src.root,
            destination=dst_root,
            transfer=TransferSpec(from_indices="docs_*", index_names="docs_*"),
        ),
    )

    # two external drainers (fresh interpreters — a forked JVM child
    # is not usable), plus this process's own engine joining the drain
    script = WORKER_SRC.format(repo=REPO, state=state_root)
    env_vars = dict(os.environ)
    env_vars["PYTHONPATH"] = REPO
    workers = [
        subprocess.Popen(
            [sys.executable, "-c", script],
            env=env_vars,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for _ in range(2)
    ]

    # SIGKILL one external worker once the drain is mid-flight
    deadline = time.time() + 300
    killed = False
    while time.time() < deadline:
        st = TaskState(state_root, "soak")
        if len(st.data["progress"]) >= 1 and len(st.data["completed"]) >= 1:
            workers[0].send_signal(signal.SIGKILL)
            killed = True
            break
        if all(w.poll() is not None for w in workers):
            break
        time.sleep(0.1)
    # this process drains whatever remains, then the survivor exits
    eng.run_task("soak", shared=True)
    for w in workers[1:]:
        assert w.wait(timeout=300) == 0
    workers[0].wait(timeout=60)

    # recovery: rebuild re-enqueues ONLY unfinished work, drain to 100
    eng.build_backlog("soak", force=True)
    status = eng.run_task("soak", shared=True)
    assert status["percentComplete"] == 100.0, status

    # doc-exact delivery, both directions
    dst = DocumentStore(dst_root, create=False)
    for ix in names:
        s = src.read(spark, ix).select("_id", "_source")
        d = dst.read(spark, ix).select("_id", "_source")
        assert s.count() == d.count()
        assert s.exceptAll(d).count() == 0
        assert d.exceptAll(s).count() == 0
    assert killed, "drain finished before the kill threshold — corpus too small"
