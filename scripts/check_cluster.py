#!/usr/bin/env python
"""Multi-JVM parity gate (r7 verdict, next-round #1).

Everything to date — oracle gate, bench, stress — runs ``local[32]``:
one JVM where "broadcasts" are in-process references and every Python
worker shares the driver's process tree. That mode structurally cannot
catch closure-serialization, broadcast-shipping, or task-side-state
bugs. Spark's ``local-cluster[N,cores,mem]`` master spawns REAL
separate executor JVMs (each launching its own Python workers), so the
at-risk shapes — block-grid applyInPandas closures, frozen-LM / bench
-matrix broadcasts, es_rest's per-partition Wire construction — run
the way they would on a 1000-executor cluster.

This harness runs the SAME work twice, in two subprocesses (one per
master, so neither session's JVM state can leak into the other):

  * every headline query + a deterministic 20-query sample of the
    rest of the registry, at sf0.01 — compared row-count / columns /
    order-insensitive value-hash between the two masters;
  * one full engine Task over a parquet DocumentStore (mutator chain,
    backlog planning, bucketed sink) — destination store contents
    hashed;
  * one full ES→ES engine Task against in-process wire fixtures
    (scan-scroll → mutate → _bulk from executor-side HTTP clients) —
    destination cluster contents hashed.

Exit 1 on any divergence; writes CHECK_cluster_r{N}.json.

Usage:
  python scripts/check_cluster.py                      # full gate
  python scripts/check_cluster.py q1_pricing_summary   # subset
  python scripts/check_cluster.py --phase worker ...   # (internal)
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LOCAL_MASTER = "local[32]"
CLUSTER_MASTER = os.environ.get(
    "SPARK_GRAFT_CLUSTER_MASTER", "local-cluster[4,8,4096]"
)
SAMPLE_N = 20


def pick_queries(all_names: "list[str]", headliners: "list[str]") -> "list[str]":
    """Headliners + a DETERMINISTIC md5-ordered sample of the rest —
    stable across runs and machines, no RNG."""
    rest = sorted(
        (n for n in all_names if n not in set(headliners)),
        key=lambda n: hashlib.md5(n.encode()).hexdigest(),
    )
    return list(headliners) + rest[:SAMPLE_N]


# ------------------------------------------------------------------ worker


def _store_hash(spark, store, indices: "list[str]") -> "tuple[str, int]":
    from check import value_hash

    frames = [store.read(spark, ix) for ix in indices]
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f)
    pdf = df.toPandas()
    return value_hash(pdf), len(pdf)


def run_worker(master: str, sf_dir: str, out: str, names: "list[str]") -> None:
    os.environ["SPARK_GRAFT_MASTER"] = master
    from check import value_hash

    import __spark_entry__ as entrymod
    from chillastic_spark.session import get_spark

    spark = get_spark(f"check-cluster {master}")
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {
        "master": master,
        "spark_master_url": spark.sparkContext.master,
        "queries": {},
        "engine": {},
    }

    qs = entrymod.queries()
    for name in names:
        t0 = time.time()
        try:
            pdf = qs[name](spark, sf_dir).toPandas()
            result["queries"][name] = {
                "rows": len(pdf),
                "cols": sorted(pdf.columns),
                "hash": value_hash(pdf),
                "sec": round(time.time() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001
            result["queries"][name] = {"error": f"{type(e).__name__}: {e}"}
        print(f"# [{master}] {name}: {result['queries'][name]}", file=sys.stderr)

    # ---- full engine Task, parquet store → parquet store
    from chillastic_spark.engine import Engine
    from chillastic_spark.model import ActionRef, Task, TransferSpec
    from chillastic_spark.sources import ENVELOPE_SCHEMA, DocumentStore

    mutator = """
TYPE = "data"
OLD = re.compile(r"^(.*)_(\\d{4}-\\d{2})-\\d{2}$")
def predicate(doc, args):
    return bool(OLD.match(doc["_index"]))
def mutate(doc, args):
    doc["_index"] = OLD.sub(r"\\1_\\2", doc["_index"])
    doc["_source"]["routed"] = True
    return doc
"""
    with tempfile.TemporaryDirectory(prefix="ckcluster_") as tmp:
        src = DocumentStore(os.path.join(tmp, "src"))
        dst = DocumentStore(os.path.join(tmp, "dst"))
        n_docs = 1200
        rows = [
            (
                f"log_2016-12-{(i % 3) + 1:02d}",
                "doc",
                f"id{i}",
                json.dumps({"field": f"value {i}", "n": i}, sort_keys=True),
                40 + (i % 7),
            )
            for i in range(n_docs)
        ]
        src_indices = sorted({r[0] for r in rows})
        for ix in src_indices:
            df = spark.createDataFrame(
                [r for r in rows if r[0] == ix], ENVELOPE_SCHEMA
            )
            src.write_documents(df, ix)
        src.put_indices(
            [
                {
                    "name": ix,
                    "settings": {"index": {"number_of_shards": 2}},
                    "mappings": {"doc": {"properties": {}}},
                    "aliases": {},
                }
                for ix in src_indices
            ]
        )
        eng = Engine(spark, os.path.join(tmp, "state"))
        eng.mutators.add("indexDate", mutator)
        eng.add_task(
            "t1",
            Task(
                source=src.root,
                destination=dst.root,
                transfer=TransferSpec(from_indices="log_*", index_names="log_*"),
                mutators=[ActionRef(id="indexDate")],
            ),
        )
        t0 = time.time()
        status = eng.run_task("t1")
        dst_hash, dst_rows = _store_hash(spark, dst, ["log_2016-12"])
        result["engine"]["parquet_task"] = {
            "completed": status["completed"],
            "percent": status["percentComplete"],
            "dst_rows": dst_rows,
            "dst_hash": dst_hash,
            "sec": round(time.time() - t0, 2),
        }
        print(
            f"# [{master}] parquet_task: {result['engine']['parquet_task']}",
            file=sys.stderr,
        )

    # ---- full engine Task, ES → ES over the wire fixtures: executor
    # JVMs' Python workers open real HTTP connections for scan-scroll
    # and _bulk — the per-partition Wire construction at-risk shape
    try:
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from es_fixture import FakeES

        # same-major pair: version-gap degradation has its own e2e
        # suite (test_es_engine_e2e); this gate isolates the multi-JVM
        # wire shape — executor-side scroll + bulk HTTP clients
        es_src, es_dst = FakeES(version="7.10.0"), FakeES(version="7.10.0")
        src_url, dst_url = es_src.start(), es_dst.start()
        try:
            for ix in ("wire_2016-12-01", "wire_2016-12-02"):
                es_src.seed(
                    ix,
                    "doc",
                    {f"id{i}": {"field": f"v {i}", "ix": ix} for i in range(150)},
                )
                es_src.seed_index_cfg(
                    ix,
                    {
                        "settings": {"index": {"number_of_shards": 2}},
                        "mappings": {"doc": {}},
                        "aliases": {},
                    },
                )
            with tempfile.TemporaryDirectory(prefix="ckcluster_es_") as tmp:
                eng = Engine(spark, os.path.join(tmp, "state"))
                eng.mutators.add("indexDate", mutator)
                eng.add_task(
                    "es2es",
                    Task(
                        source=src_url,
                        destination=dst_url,
                        transfer=TransferSpec(
                            from_indices="wire_*", index_names="wire_*"
                        ),
                        mutators=[ActionRef(id="indexDate")],
                    ),
                )
                t0 = time.time()
                status = eng.run_task("es2es")
                contents = es_dst.contents("wire_2016-12")
                dig = hashlib.md5(
                    json.dumps(
                        {k: contents[k] for k in sorted(contents)},
                        sort_keys=True,
                    ).encode()
                ).hexdigest()
                result["engine"]["es2es_task"] = {
                    "completed": status["completed"],
                    "percent": status["percentComplete"],
                    "dst_rows": len(contents),
                    "dst_hash": dig,
                    "sec": round(time.time() - t0, 2),
                }
                print(
                    f"# [{master}] es2es_task:"
                    f" {result['engine']['es2es_task']}",
                    file=sys.stderr,
                )
        finally:
            es_src.stop()
            es_dst.stop()
    except ImportError as e:  # flask genuinely absent
        result["engine"]["es2es_task"] = {"skipped": f"ImportError: {e}"}

    # ---- r9 (r8 verdict #3): the stateful/index surface across real
    # executor JVMs — the shapes the query panel cannot reach.

    # applyInPandasWithState sessionize: per-key state rides the state
    # store on EXECUTOR JVMs here (local[32] keeps it in-process)
    try:
        import pathlib

        sys.path.insert(0, os.path.join(REPO, "tests"))
        from conftest import stage_events_stream
        from chillastic_spark.streaming import stateful_sessionize

        with tempfile.TemporaryDirectory(prefix="ckcluster_stream_") as tmp:
            ev_dir = stage_events_stream(pathlib.Path(tmp))
            q = stateful_sessionize(
                spark,
                ev_dir,
                os.path.join(tmp, "ck"),
                query_name="ckc_sess",
            )
            q.awaitTermination(600)
            pdf = spark.sql(
                "SELECT user_id, max(n_sessions) AS n_sessions, "
                "max(n_events) AS n_events FROM ckc_sess GROUP BY user_id"
            ).toPandas()
            result["engine"]["stream_sessionize"] = {
                "rows": len(pdf),
                "hash": value_hash(pdf),
            }
    except Exception as e:  # noqa: BLE001 — recorded, compared, flagged
        result["engine"]["stream_sessionize"] = {
            "error": f"{type(e).__name__}: {e}"
        }
    print(
        f"# [{master}] stream_sessionize:"
        f" {result['engine']['stream_sessionize']}",
        file=sys.stderr,
    )

    # vector index lifecycle: build → incremental add → serve →
    # compact → serve; hashes must agree across masters AND across the
    # compaction (rows never change buckets)
    try:
        from pyspark.sql import functions as F

        from chillastic_spark.sources.vector_index import (
            ann_query_index,
            build_vector_index,
            compact_vector_index,
            update_vector_index,
        )
        from chillastic_spark.tables import load

        with tempfile.TemporaryDirectory(prefix="ckcluster_vi_") as tmp:
            e = load(spark, sf_dir, "embeddings")
            idx = os.path.join(tmp, "vi")
            build_vector_index(e.filter(F.col("vec_id") >= 10), idx, planes=5)
            meta = update_vector_index(e.filter(F.col("vec_id") < 10), idx)
            q = e.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            served = ann_query_index(spark, idx, q, k=10, probes=3).toPandas()
            compact_vector_index(spark, idx)
            after = ann_query_index(spark, idx, q, k=10, probes=3).toPandas()
            result["engine"]["vector_index_lifecycle"] = {
                "rows": len(served),
                "n_vectors": meta["n_vectors"],
                "hash": value_hash(served),
                "hash_after_compact": value_hash(after),
            }
    except Exception as e:  # noqa: BLE001
        result["engine"]["vector_index_lifecycle"] = {
            "error": f"{type(e).__name__}: {e}"
        }
    print(
        f"# [{master}] vector_index_lifecycle:"
        f" {result['engine']['vector_index_lifecycle']}",
        file=sys.stderr,
    )

    # inverted index lifecycle: build on half the corpus → incremental
    # update with the other half → BM25 serve
    try:
        from pyspark.sql import functions as F

        from chillastic_spark.queries.search import TERMS
        from chillastic_spark.sources.search_index import (
            bm25_search_index,
            build_inverted_index,
            update_inverted_index,
        )
        from chillastic_spark.tables import load

        with tempfile.TemporaryDirectory(prefix="ckcluster_si_") as tmp:
            d = load(spark, sf_dir, "documents")
            idx = os.path.join(tmp, "si")
            build_inverted_index(
                spark, d.filter(F.col("doc_id") % 2 == 0), idx
            )
            stats = update_inverted_index(
                spark, d.filter(F.col("doc_id") % 2 == 1), idx
            )
            pdf = bm25_search_index(spark, idx, TERMS, k=20).toPandas()
            result["engine"]["search_index_lifecycle"] = {
                "rows": len(pdf),
                "n_docs": stats["n_docs"],
                "hash": value_hash(pdf),
            }
    except Exception as e:  # noqa: BLE001
        result["engine"]["search_index_lifecycle"] = {
            "error": f"{type(e).__name__}: {e}"
        }
    print(
        f"# [{master}] search_index_lifecycle:"
        f" {result['engine']['search_index_lifecycle']}",
        file=sys.stderr,
    )

    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


# ------------------------------------------------------------------ parent


def run_parent(sf_dir: str, only: "list[str]") -> int:
    import __spark_entry__ as entrymod
    from chillastic_spark.queries import all_queries

    registry = all_queries()
    headliners = [n for n, q in registry.items() if q.headline]
    # r9: force the bipartite incremental dedup (r8 verdict #3) into
    # every full run — its batch-vs-pool block grid is exactly the
    # closure/broadcast shape multi-JVM execution stresses
    forced = ["embedding_dup_incremental"]
    names = only or pick_queries(
        list(entrymod.queries()),
        headliners + [n for n in forced if n not in headliners],
    )
    print(f"comparing {len(names)} queries under {LOCAL_MASTER} vs {CLUSTER_MASTER}")

    outs = {}
    for master in (LOCAL_MASTER, CLUSTER_MASTER):
        fd, out = tempfile.mkstemp(suffix=".json", prefix="ckcluster_")
        os.close(fd)
        outs[master] = out
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        env.pop("SPARK_GRAFT_MASTER", None)
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--phase",
            "worker",
            "--master",
            master,
            "--sf",
            sf_dir,
            "--out",
            out,
            "--queries",
            ",".join(names),
        ]
        t0 = time.time()
        rc = subprocess.run(cmd, env=env, cwd=REPO).returncode
        print(f"worker [{master}] rc={rc} in {time.time() - t0:.0f}s")
        if rc != 0:
            print(f"worker for {master} failed")
            return 1

    with open(outs[LOCAL_MASTER]) as f:
        local = json.load(f)
    with open(outs[CLUSTER_MASTER]) as f:
        cluster = json.load(f)

    report = {
        "sf_dir": sf_dir,
        "local_master": LOCAL_MASTER,
        "cluster_master": CLUSTER_MASTER,
        "queries": {},
        "engine": {},
        "mismatches": [],
    }
    for name in names:
        a = local["queries"].get(name, {})
        b = cluster["queries"].get(name, {})
        ok = (
            "error" not in a
            and "error" not in b
            and a.get("rows") == b.get("rows")
            and a.get("cols") == b.get("cols")
            and a.get("hash") == b.get("hash")
        )
        report["queries"][name] = {
            "match": ok,
            "rows": a.get("rows"),
            "hash_local": a.get("hash"),
            "hash_cluster": b.get("hash"),
            "sec_local": a.get("sec"),
            "sec_cluster": b.get("sec"),
            **({"error_local": a["error"]} if "error" in a else {}),
            **({"error_cluster": b["error"]} if "error" in b else {}),
        }
        if not ok:
            report["mismatches"].append(name)
        print(f"{'PASS' if ok else 'FAIL'}  {name}")

    for task in ("parquet_task", "es2es_task"):
        a = local["engine"].get(task, {})
        b = cluster["engine"].get(task, {})
        if "skipped" in a or "skipped" in b:
            report["engine"][task] = {"skipped": a.get("skipped") or b.get("skipped")}
            print(f"SKIP  engine.{task}: {report['engine'][task]['skipped']}")
            continue
        ok = (
            a.get("dst_hash") == b.get("dst_hash")
            and a.get("completed") == b.get("completed")
            and a.get("percent") == 100.0 == b.get("percent")
        )
        report["engine"][task] = {"match": ok, "local": a, "cluster": b}
        if not ok:
            report["mismatches"].append(f"engine.{task}")
        print(f"{'PASS' if ok else 'FAIL'}  engine.{task}")

    # r9: stateful streaming + materialized index lifecycles — compare
    # every value-bearing key (hashes, rows, counters); timing excluded
    for sect in (
        "stream_sessionize",
        "vector_index_lifecycle",
        "search_index_lifecycle",
    ):
        a = local["engine"].get(sect, {})
        b = cluster["engine"].get(sect, {})
        keys = ("rows", "hash", "hash_after_compact", "n_vectors", "n_docs")
        ok = (
            "error" not in a
            and "error" not in b
            and bool(a)
            and all(a.get(k) == b.get(k) for k in keys)
        )
        # within-master invariant: compaction must not change serving
        if sect == "vector_index_lifecycle" and ok:
            ok = (
                a.get("hash") == a.get("hash_after_compact")
                and b.get("hash") == b.get("hash_after_compact")
            )
        report["engine"][sect] = {"match": ok, "local": a, "cluster": b}
        if not ok:
            report["mismatches"].append(f"engine.{sect}")
        print(f"{'PASS' if ok else 'FAIL'}  engine.{sect}")

    out_path = os.environ.get("SPARK_GRAFT_CLUSTER_OUT")
    if not out_path:
        rounds = [
            int(m.group(1))
            for f in os.listdir(REPO)
            if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))
        ]
        n = (max(rounds) + 1) if rounds else 0
        out_path = os.path.join(REPO, f"CHECK_cluster_r{n:02d}.json")
    # a subset run must not overwrite full evidence
    if only:
        out_path += ".partial"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nevidence written: {out_path}")
    print(f"{len(report['mismatches'])} mismatches"
          + (f": {report['mismatches']}" if report["mismatches"] else ""))
    for p in outs.values():
        os.unlink(p)
    return 1 if report["mismatches"] else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="parent", choices=["parent", "worker"])
    ap.add_argument("--master", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", default="")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    if args.phase == "worker":
        run_worker(
            args.master, args.sf, args.out,
            [n for n in args.queries.split(",") if n],
        )
        return 0
    return run_parent(args.sf, args.names)


if __name__ == "__main__":
    sys.exit(main())
