"""Structured-streaming continuous reindex (SURVEY §2.9).

The reference approximates continuity by polling a work queue every 2 s
(worker.js:12,61-123). The Spark-native version is a file-source stream
over the source index directory with the same mutate→upsert pipeline in
``foreachBatch`` — exactly-once by idempotent MERGE, checkpointed
offsets replacing the Redis progress hash.
"""
from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from chillastic_spark.operators.mutate import apply_data_mutators
from chillastic_spark.sinks import upsert
from chillastic_spark.sources import ENVELOPE_SCHEMA, DocumentStore


def continuous_reindex(
    spark: SparkSession,
    source: DocumentStore,
    index: str,
    dest: DocumentStore,
    checkpoint_dir: str,
    mutators_by_type: Optional[dict] = None,
    available_now: bool = True,
    type_filter: Optional[str] = None,
) -> StreamingQuery:
    """readStream over one source index → mutate chain → MERGE to dest.

    ``available_now=True`` drains what exists and stops (the batch-with-
    resume mode); False runs continuously picking up new files.
    """
    stream = (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source.index_path(index))
    )
    if type_filter is not None:
        stream = stream.filter(stream["_type"] == type_filter)
    mutators = (mutators_by_type or {}).get("data")

    def process(batch_df, batch_id: int) -> None:
        upsert(spark, dest, apply_data_mutators(batch_df, mutators))

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
