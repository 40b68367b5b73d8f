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
