#!/usr/bin/env python
"""Full-data-plane soak with a mid-transfer SIGKILL (r7 verdict #5).

test_locks.py pins the shared-backlog exactly-once protocol over a
SYNTHETIC 200-subtask backlog; this harness runs the REAL thing: a
complete reindex Task over the sf1 50k-doc corpus, drained by FOUR
separate OS processes running ``run_task(shared=True)`` (each with its
own SparkSession — the reference's N-worker deployment), one of them
SIGKILLed while a documents subtask is in flight. The survivors drain
the rest; the corpse's subtask is recovered by the documented
build_backlog rebuild; delivery is then reconciled DOC-EXACT against
the source (both directions of exceptAll on (_index,_id,_source)).

Runs twice: parquet DocumentStore → parquet DocumentStore, and
fixture-ES → fixture-ES (the wire data plane: executor-side scrolls
and _bulk through HTTP, fixtures hosted by THIS parent process).

Emits SOAK_r{N}.json. Usage: python scripts/soak_kill.py
Subcommands (internal): prepare / work / finish / reconcile.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

SF_DIR = os.path.join(ROOT, ".scale", "sf1")
N_WORKERS = 4
N_INDICES = 16


def _spark(cpus: int = 8):
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))
    from chillastic_spark.session import get_spark

    spark = get_spark("soak")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _envelope(spark):
    from pyspark.sql import functions as F

    from chillastic_spark.tables import load

    d = load(spark, SF_DIR, "documents")
    return d.select(
        F.concat(F.lit("docs_"), F.pmod(F.col("doc_id"), F.lit(N_INDICES)).cast("string")).alias("_index"),
        F.lit("doc").alias("_type"),
        F.col("doc_id").cast("string").alias("_id"),
        F.to_json(F.struct(*[c for c in d.columns])).alias("_source"),
        F.length(F.to_json(F.struct(*[c for c in d.columns]))).cast("int").alias("_size"),
    )


def cmd_prepare(work_dir: str, mode: str, src_url: str, dst_url: str) -> None:
    """Build the source store (parquet mode), admit the task (plans the
    backlog), exit. Runs in its own process so the parent stays
    JVM-free for fork-safe fixture hosting."""
    from chillastic_spark.engine import Engine
    from chillastic_spark.model import Task, TransferSpec
    from chillastic_spark.sources import DocumentStore

    spark = _spark(cpus=16)
    if mode == "parquet":
        src = DocumentStore(os.path.join(work_dir, "src"))
        env = _envelope(spark)
        names = [f"docs_{i}" for i in range(N_INDICES)]
        for ix in names:
            src.write_documents(env.filter(env["_index"] == ix), ix)
        src.put_indices(
            [
                {
                    "name": ix,
                    "settings": {"index": {"number_of_shards": 2}},
                    "mappings": {"doc": {"properties": {}}},
                    "aliases": {},
                }
                for ix in names
            ]
        )
        DocumentStore(os.path.join(work_dir, "dst"))  # create dirs
        src_url = src.root
        dst_url = os.path.join(work_dir, "dst")
    eng = Engine(spark, os.path.join(work_dir, "state"))
    eng.add_task(
        "soak",
        Task(
            source=src_url,
            destination=dst_url,
            transfer=TransferSpec(from_indices="docs_*", index_names="docs_*"),
        ),
    )
    st = eng.get_task_status("soak")
    print(json.dumps({"backlog_planned": st}), flush=True)


def cmd_work(work_dir: str) -> None:
    """One shared-mode drainer: its own SparkSession, pops from the
    shared backlog until empty."""
    from chillastic_spark.engine import Engine

    spark = _spark(cpus=8)
    eng = Engine(spark, os.path.join(work_dir, "state"))
    status = eng.run_task("soak", shared=True)
    print(json.dumps({"worker_status": status}), flush=True)


def cmd_finish(work_dir: str) -> None:
    """The documented corpse recovery: rebuild the backlog (completed
    subtasks are skipped, dead progress cleared) and drain to 100%."""
    from chillastic_spark.engine import Engine

    spark = _spark(cpus=16)
    eng = Engine(spark, os.path.join(work_dir, "state"))
    eng.build_backlog("soak", force=True)
    status = eng.run_task("soak", shared=True)
    print(json.dumps({"final_status": status}), flush=True)


def cmd_reconcile(work_dir: str, mode: str, src_url: str, dst_url: str) -> None:
    """Doc-exact delivery check, both directions."""
    from pyspark.sql import functions as F

    from chillastic_spark.sources import open_store

    spark = _spark(cpus=16)
    if mode == "parquet":
        src_url = os.path.join(work_dir, "src")
        dst_url = os.path.join(work_dir, "dst")
    src = open_store(src_url)
    dst = open_store(dst_url)
    names = [f"docs_{i}" for i in range(N_INDICES)]

    def read_all(store):
        frames = [
            store.read(spark, ix).select("_index", "_id", "_source")
            for ix in names
        ]
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f)
        # _source is JSON text: key order may differ across engines —
        # normalize through from_json-less sort by re-serializing via
        # a canonical map sort is overkill here because BOTH sides
        # were written by this engine from the same rows; compare raw.
        return df
    s, d = read_all(src), read_all(dst)
    out = {
        "src_rows": s.count(),
        "dst_rows": d.count(),
        "missing": s.exceptAll(d).count(),
        "extra": d.exceptAll(s).count(),
    }
    print(json.dumps({"reconcile": out}), flush=True)


# ------------------------------------------------------------------ parent


def _run(phase: str, work_dir: str, mode: str, src_url: str = "",
         dst_url: str = "", background: bool = False):
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT
    cmd = [
        sys.executable, os.path.abspath(__file__), "--phase", phase,
        "--work-dir", work_dir, "--mode", mode,
        "--src-url", src_url, "--dst-url", dst_url,
    ]
    if background:
        return subprocess.Popen(
            cmd, env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
    p = subprocess.run(cmd, env=env, cwd=ROOT, capture_output=True, text=True)
    if p.returncode != 0:
        raise SystemExit(
            f"{phase} failed rc={p.returncode}\n{p.stderr[-3000:]}"
        )
    return p.stdout


def _state_snapshot(work_dir: str) -> dict:
    from chillastic_spark.engine import TaskState

    st = TaskState(os.path.join(work_dir, "state"), "soak")
    return {
        "completed": len(st.data["completed"]),
        "backlog": len(st.data["backlog"]),
        "progress": len(st.data["progress"]),
        "percent": st.status()["percentComplete"],
    }


def run_scenario(mode: str, base_dir: str) -> dict:
    work_dir = os.path.join(base_dir, mode)
    os.makedirs(work_dir, exist_ok=True)
    result: dict = {"mode": mode}

    fixtures = []
    src_url = dst_url = ""
    if mode == "es":
        import duckdb

        from es_fixture import FakeES

        src_es, dst_es = FakeES(version="7.10.0"), FakeES(version="7.10.0")
        src_url, dst_url = src_es.start(), dst_es.start()
        fixtures = [src_es, dst_es]
        p = f"{SF_DIR}/documents.parquet"
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        rows = duckdb.sql(
            f"SELECT * FROM read_parquet('{glob}')"
        ).df()
        cols = list(rows.columns)
        by_ix: dict = {}
        for rec in rows.itertuples(index=False):
            doc = dict(zip(cols, rec))
            doc_id = int(doc["doc_id"])
            src_doc = {
                k: (v.item() if hasattr(v, "item") else v)
                for k, v in doc.items()
            }
            by_ix.setdefault(f"docs_{doc_id % N_INDICES}", {})[
                str(doc_id)
            ] = src_doc
        for ix, docs in by_ix.items():
            src_es.seed(ix, "doc", docs)
            src_es.seed_index_cfg(ix, {
                "settings": {"index": {"number_of_shards": 2}},
                "mappings": {"doc": {}},
                "aliases": {},
            })

    t0 = time.time()
    out = _run("prepare", work_dir, mode, src_url, dst_url)
    result["prepare"] = json.loads(out.splitlines()[-1])
    result["prepare_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    workers = [
        _run("work", work_dir, mode, src_url, dst_url, background=True)
        for _ in range(N_WORKERS)
    ]
    # SIGKILL worker 0 once the drain is demonstrably mid-flight:
    # >=2 data subtasks completed and >=2 currently in progress means
    # every worker is inside a transfer with overwhelming probability
    killed_at = None
    while True:
        snap = _state_snapshot(work_dir)
        if snap["completed"] >= 2 and snap["progress"] >= 2:
            workers[0].send_signal(signal.SIGKILL)
            killed_at = snap
            break
        if all(w.poll() is not None for w in workers):
            break  # drained before the kill threshold — record it
        time.sleep(0.3)
    for w in workers[1:]:
        w.wait(timeout=1800)
    workers[0].wait(timeout=60)
    result["kill_snapshot"] = killed_at
    result["after_drain"] = _state_snapshot(work_dir)
    result["drain_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    out = _run("finish", work_dir, mode, src_url, dst_url)
    result["finish"] = json.loads(out.splitlines()[-1])
    result["finish_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    out = _run("reconcile", work_dir, mode, src_url, dst_url)
    result["reconcile"] = json.loads(out.splitlines()[-1])["reconcile"]
    result["reconcile_sec"] = round(time.time() - t0, 1)

    for f in fixtures:
        f.stop()
    r = result["reconcile"]
    result["doc_exact"] = (
        r["missing"] == 0 and r["extra"] == 0 and r["src_rows"] == r["dst_rows"]
    )
    result["final_percent"] = result["finish"]["final_status"][
        "percentComplete"
    ]
    return result


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="parent")
    ap.add_argument("--work-dir", default="")
    ap.add_argument("--mode", default="parquet")
    ap.add_argument("--src-url", default="")
    ap.add_argument("--dst-url", default="")
    args = ap.parse_args()
    if args.phase == "prepare":
        cmd_prepare(args.work_dir, args.mode, args.src_url, args.dst_url)
        return 0
    if args.phase == "work":
        cmd_work(args.work_dir)
        return 0
    if args.phase == "finish":
        cmd_finish(args.work_dir)
        return 0
    if args.phase == "reconcile":
        cmd_reconcile(args.work_dir, args.mode, args.src_url, args.dst_url)
        return 0

    import tempfile

    base = tempfile.mkdtemp(prefix="soak_")
    results = [run_scenario("parquet", base), run_scenario("es", base)]
    ok = all(r["doc_exact"] and r["final_percent"] == 100.0 for r in results)
    payload = {
        "metric": "soak_sigkill_shared_reindex",
        "workers": N_WORKERS,
        "indices": N_INDICES,
        "corpus": "sf1 documents (50k docs)",
        "scenarios": results,
        "pass": ok,
    }
    print(json.dumps(payload))
    rounds = [
        int(m.group(1))
        for f in os.listdir(ROOT)
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    n = (max(rounds) + 1) if rounds else 0
    with open(os.path.join(ROOT, f"SOAK_r{n:02d}.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(f"written: SOAK_r{n:02d}.json", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
