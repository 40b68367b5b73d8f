"""Loaders for the driver-generated testdata tables (TESTDATA.md)."""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _events_ts_is_nanos(path: str) -> bool:
    """Probe the parquet footer for a TIMESTAMP(NANOS) ts column —
    driver-side, one footer, no Spark job."""
    import glob

    import pyarrow.parquet as pq

    files = [path] if os.path.isfile(path) else sorted(
        glob.glob(os.path.join(path, "*.parquet"))
    )
    if not files:
        return False
    try:
        import pyarrow as pa

        t = pq.read_schema(files[0]).field("ts").type
        # type-level check, not a string match: a tz-annotated nanos
        # column prints 'timestamp[ns, tz=UTC]' and a string equality
        # would miss it — the Spark read then throws the exact
        # 'Illegal Parquet type' this probe exists to absorb
        return pa.types.is_timestamp(t) and t.unit == "ns"
    except Exception:
        return False  # unreadable/odd schema: let the Spark read report it


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts HAS shipped as parquet TIMESTAMP(NANOS), which
        # Spark's vectorized reader rejects; read nanos as long and
        # floor-convert to micros — exactly DuckDB's TIMESTAMP_NS →
        # TIMESTAMP truncation. The legacy flag is SESSION-GLOBAL and
        # makes every later nanos parquet silently read as bigint, so
        # only set it when this file's footer actually carries nanos
        # (micros-era data never mutates the session).
        path = os.path.join(sf_dir, "events.parquet")
        is_nanos = _events_ts_is_nanos(path)
        if is_nanos:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        # div 1000 ONLY when the footer proved nanos: a bigint ts can
        # also mean the file genuinely stores int64 (e.g. epoch-micros
        # staged by a producer) — guessing nanos there would shrink
        # every timestamp 1000x with no error. FLOOR division (via the
        # non-negative pmod remainder), not `div`: `div` truncates
        # toward zero, but DuckDB's TIMESTAMP_NS → TIMESTAMP cast
        # floors, so a pre-epoch nanos ts would land 1 µs later than
        # the oracle sees it
        if is_nanos and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000"))
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

