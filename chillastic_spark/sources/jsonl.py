"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
LLM training-data pipelines.

Scale rules baked in:
* **Explicit schema, never inference.** Schema inference is a full
  extra pass over 100 TB; every reader here takes a StructType (or DDL
  string) up front. Column pruning then reaches the JSON parser
  (Jackson parses only requested fields).
* **Corrupt records are data, not exceptions.** PERMISSIVE mode routes
  unparseable lines to a `_corrupt_record` column; `read_jsonl`
  splits them into a quarantine DataFrame (same side-channel contract
  as operators/mutate.py) instead of failing the job 80 TB in.
* **Writers partition by a column when given** — the downstream scan
  prunes partitions for free.
"""
from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _as_schema(schema: Union[str, T.StructType]) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    return T.StructType.fromDDL(schema)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: Union[str, T.StructType],
    multiline: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON with an explicit schema.

    Returns ``(good, quarantine)``: rows that parsed cleanly (schema
    columns only) and raw corrupt lines (``_corrupt_record`` string
    column).

    Scale contract: NOTHING corpus-sized is ever cached. ``good``
    reads straight from the source (a query that projects real fields
    alongside the corrupt predicate is allowed by SPARK-21610); the
    quarantine side caches only the corrupt ROWS — Spark disallows a
    scan whose referenced columns are *only* the corrupt column, and
    the cache barrier below both satisfies that rule and bounds the
    materialised data by corrupt volume, not corpus volume. Using it
    costs a second source scan — the right trade at 100 TB, where the
    old whole-input cache() filled executor disks to serve a column
    most callers never read.
    """
    base = _as_schema(schema)
    if CORRUPT_COL in base.fieldNames():
        raise ValueError(f"schema must not predeclare {CORRUPT_COL}")
    with_corrupt = T.StructType(
        list(base.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", "true" if multiline else "false")
        .json(path)
    )
    return _split_corrupt(df, base)


def _split_corrupt(
    df: DataFrame, base: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) off a PERMISSIVE reader — see read_jsonl for
    the SPARK-21610 / bounded-cache reasoning."""
    good = df.filter(F.col(CORRUPT_COL).isNull()).select(*base.fieldNames())
    # cache point carries the full schema so the underlying scan stays
    # legal; only corrupt rows are materialised (lazily, first use)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).cache()
    quarantine = bad.select(CORRUPT_COL)
    return good, quarantine


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: Optional[str] = None,
    mode: str = "overwrite",
    compression: Optional[str] = "gzip",
) -> None:
    """Write a DataFrame as JSONL; one directory level per
    ``partition_by`` value when given (downstream partition pruning)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: Union[str, T.StructType],
    header: bool = True,
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of read_jsonl: explicit schema, PERMISSIVE corrupt-line
    quarantine, returns ``(good, quarantine)``."""
    base = _as_schema(schema)
    if CORRUPT_COL in base.fieldNames():
        raise ValueError(f"schema must not predeclare {CORRUPT_COL}")
    with_corrupt = T.StructType(
        list(base.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", "true" if header else "false")
        .option("delimiter", delimiter)
        .csv(path)
    )
    return _split_corrupt(df, base)
