"""Fault-injection: a task that crashes on its first attempt must be
retried and produce the exact result (the reference's retrying
search/scroll, SURVEY S2/S3 → Spark task retries).

Runs in a subprocess because retry needs master local[N, maxFailures]
and the suite's shared session is plain local[8] (one SparkContext per
JVM)."""
import subprocess
import sys

SCRIPT = r"""
import sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[4, 4]")
    .appName("fault-injection")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = spark.range(0, 10000).repartition(4)

def flaky(batches):
    from pyspark import TaskContext

    ctx = TaskContext.get()
    # every partition dies on its first attempt — a 100%-failure first
    # wave, far harsher than one lost executor
    if ctx.attemptNumber() == 0:
        raise RuntimeError("injected first-attempt failure")
    for pdf in batches:
        pdf["id"] = pdf["id"] * 2
        yield pdf

out = df.mapInPandas(flaky, schema="id long")
total = out.agg(F.sum("id")).collect()[0][0]
expected = 2 * (9999 * 10000 // 2)
assert total == expected, (total, expected)
n = out.count()
assert n == 10000, n
print("RETRY_OK", total, n)
"""


def test_first_attempt_failures_are_retried_exactly():
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "RETRY_OK 99990000 10000" in r.stdout, r.stdout + r.stderr


ES_SCAN_SCRIPT = r"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) if "__file__" in dir() else ".")
sys.path.insert(0, "TESTS_DIR")
from es_fixture import FakeES
from pyspark.sql import SparkSession

from chillastic_spark.sources.es_rest import scan_to_df

spark = (
    SparkSession.builder.master("local[4, 4]")
    .appName("es-scan-retry")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# every slice's FIRST search attempt dies with HTTP 500 — both Spark
# tasks must fail once and be retried by the scheduler (SURVEY S2)
es = FakeES(fail_first_searches=2)
es.seed("idx", "doc", {f"d{i}": {"v": i, "__size": 10} for i in range(40)})
url = es.start()

df = scan_to_df(spark, url, "idx", "doc", flush_size=7, slices=2)
rows = df.collect()
ids = sorted(r["_id"] for r in rows)
assert ids == sorted(f"d{i}" for i in range(40)), ids[:5]
assert len(ids) == len(set(ids)) == 40  # exactly once despite retries
searches = es.requests_of("search")
assert len(searches) >= 4, len(searches)  # 2 failed + >=2 retried
print("ES_SCAN_RETRY_OK", len(ids), len(searches))
"""


def test_es_scan_task_retry_over_the_wire(tmp_path):
    """Distributed wire scan survives per-task search failures: each
    sliced-scroll task's first `_search` gets HTTP 500, Spark retries
    the task, and the retried scroll drains its slice exactly once."""
    import os

    script = ES_SCAN_SCRIPT.replace(
        "TESTS_DIR", os.path.dirname(os.path.abspath(__file__))
    )
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert "ES_SCAN_RETRY_OK 40" in r.stdout, r.stdout[-2000:] + r.stderr[-2000:]
