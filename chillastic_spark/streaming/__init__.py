"""Structured-streaming continuous reindex (SURVEY §2.9).

The reference approximates continuity by polling a work queue every 2 s
(worker.js:12,61-123). The Spark-native version is a file-source stream
over the source index directory with the same mutate→upsert pipeline in
``foreachBatch`` — exactly-once by idempotent MERGE, checkpointed
offsets replacing the Redis progress hash.
"""
from __future__ import annotations

import os

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from chillastic_spark import functions as CF
from chillastic_spark.operators.mutate import apply_data_mutators
from chillastic_spark.persist import batch_scope, persist_mode, release
from chillastic_spark.sinks import upsert
from chillastic_spark.sources import ENVELOPE_SCHEMA, DocumentStore

# Stream-dir contract: ``ts`` is a raw int64 epoch-MICROS column (see
# tests/conftest.stage_events_stream). A nanos-unit timestamp parquet
# (e.g. testdata events.parquet copied verbatim) must FAIL to read, not
# silently misparse — enforced by an explicit footer probe in
# read_events_stream (the batch path's session-wide nanosAsLong flag
# would otherwise let such a file read as long, 1000x off).
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    # enforce the stream-dir contract DIRECTLY: ts must be raw int64
    # epoch-MICROS. Relying on the read to fail for timestamp-typed
    # files is not enough — tables.load sets the session-wide
    # nanosAsLong legacy flag for the batch path, after which a nanos
    # parquet would silently read as long and every timestamp would be
    # interpreted 1000x off. Probe the footers of EVERY file present
    # at start (a footer read is a few KB of I/O; a capped probe would
    # let a mistyped 5th file misparse silently, which is exactly the
    # failure this check exists to make loud). Files that appear after
    # start are inherently unverifiable from here — the staging
    # contract covers them.
    import glob as _glob

    import pyarrow.parquet as _pq

    for f in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        t = _pq.read_schema(f).field("ts").type
        if str(t) != "int64":
            raise ValueError(
                f"events stream contract: ts must be int64 epoch-micros, "
                f"got {t} in {f} (stage the stream dir with raw micros — "
                "see tests/conftest.stage_events_stream)"
            )
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.col("ts")))


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
    stream = source.stream_scratch_filter(
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source.stream_path(index))
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


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "windowed_counts",
) -> StreamingQuery:
    """Watermarked tumbling-window aggregation (the streaming twin of
    the ``events_hourly`` batch query): late data beyond ``watermark``
    is dropped, completed windows emit exactly once (append mode).
    State is bounded by the watermark — the 100 TB requirement for an
    unbounded stream."""
    events = read_events_stream(spark, events_path)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # round the DECIMAL then cast (exact HALF_UP), matching
            # the batch twin events_hourly — rounding after the double
            # cast can disagree at repr boundaries
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"), "event_type", "cnt", "sum_value"
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_distinct_users(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "windowed_distinct",
) -> StreamingQuery:
    """Streaming HLL: approximate distinct users per (window,
    event_type). The sketch is mergeable, so state per group is FIXED
    regardless of cardinality — COUNT(DISTINCT) over an unbounded
    stream without unbounded state (exact streaming distinct would keep
    every user id in the state store). Size the state store for ~16 KB
    per group: rsd=0.01 forces HLL++ precision p≈14 (~2^14 registers),
    not the ~1.5 KB of the textbook p=11 sketch — relax rsd to ~0.03 if
    per-group state dominates."""
    events = read_events_stream(spark, events_path)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
        .select(F.col("win.start").alias("window_start"), "event_type", "approx_users")
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def deduplicated_ingest(
    spark: SparkSession,
    source: DocumentStore,
    index: str,
    dest: DocumentStore,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming exact-dedup ingest: content-fingerprint dedup ACROSS
    micro-batches with bounded state.

    ``dropDuplicates`` keyed on the fingerprint removes repeats that
    arrive in later files/batches (state in the checkpoint); combined
    with the MERGE sink the pipeline is exactly-once AND content-deduped
    end-to-end. At true 100 TB stream scale swap to
    ``dropDuplicatesWithinWatermark`` so state stays bounded by event
    time instead of growing with distinct keys.
    """

    stream = source.stream_scratch_filter(
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(source.stream_path(index))
    )
    # NULL-_source envelopes (a real wire shape: metadata-only docs)
    # are DISTINCT documents keyed by _id, not one content group:
    # fingerprint(NULL) is NULL and dropDuplicates groups NULL keys, so
    # a bare fingerprint key would keep ONE such doc ever (state
    # persists across the stream's lifetime) and silently drop the
    # rest. Same convention as operators.exact_dedup's coalesce.
    fp = F.coalesce(
        CF.fingerprint(F.col("_source")),
        F.concat(F.lit("__null#"), F.col("_id")),
        F.lit("__null__"),
    )
    deduped = stream.withColumn("__fp", fp).dropDuplicates(["__fp"]).drop("__fp")

    def process(batch_df, batch_id: int) -> None:
        upsert(spark, dest, batch_df)

    writer = (
        deduped.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


SESSION_STATE_SCHEMA = "last_ts long, n_sessions long, n_events long"
SESSION_OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"


def stateful_sessionize(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    query_name: str = "stateful_sessions",
) -> StreamingQuery:
    """Custom stateful streaming operator (SURVEY §2.9 → Spark mapping
    ``applyInPandasWithState``): per-user gap-based session counting
    that survives across micro-batches via explicit group state.

    Emits the running (user_id, n_sessions, n_events) after each batch.

    NOTE: both this and windowed_event_counts write to the ``memory``
    sink for inspectability — Spark's memory sink does NOT support
    checkpoint recovery, so a restart needs a fresh checkpoint dir.
    Production deployments swap the writer for foreachBatch/Kafka (as
    ``continuous_reindex`` does), which resume exactly-once.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd_

        (user_id,) = key
        last_ts, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0)
        )
        ts_list = []
        for pdf in pdfs:
            ts_list.extend(int(v.value // 1000) for v in pdf["ts"])  # ns→µs
        ts_list.sort()
        for t in ts_list:
            if last_ts is None or t - last_ts > gap_us:
                n_sessions += 1
            # never regress: a late event older than the frontier must
            # not drag last_ts backwards, or the NEXT in-order event
            # would measure its gap against the stale timestamp and
            # open a spurious session (late events cannot retroactively
            # split earlier sessions — the kappa-architecture caveat)
            last_ts = t if last_ts is None else max(last_ts, t)
            n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd_.DataFrame(
            [{"user_id": user_id, "n_sessions": n_sessions, "n_events": n_events}]
        )

    # drop null-ts rows like every watermarked twin here does
    # implicitly: a NaT reaches pandas as INT64_MIN, sorts first, and
    # fabricates up to two sessions per null row
    events = read_events_stream(spark, events_path).filter(
        F.col("ts").isNotNull()
    )
    sessions = events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def purchase_attribution_stream(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    query_name: str = "purchase_attribution",
) -> StreamingQuery:
    """Watermarked stream-stream interval join — the streaming twin of
    the batch ``purchase_prior_window`` query: each purchase event is
    joined to the SAME user's events in the preceding hour.

    Both sides carry a watermark and the join condition time-bounds the
    match window, so Spark can expire join state: a prior event older
    than (watermark + 1h) can never match a future purchase and is
    dropped from the state store. Unbounded state is the failure mode
    of naive stream joins at 100 TB/day — the time bound is what makes
    this run forever.
    """
    purchases = (
        read_events_stream(spark, events_path)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    prior = (
        read_events_stream(spark, events_path)
        .select("event_id", "user_id", "ts", "value")
        .withWatermark("ts", watermark)
    )
    joined = purchases.join(
        prior,
        F.expr(
            "p_user_id = user_id AND ts >= p_ts - INTERVAL 1 HOUR AND ts < p_ts"
        ),
    ).select("p_event_id", "event_id", "value")
    return (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sliding_window_rates(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    query_name: str = "sliding_rates",
) -> StreamingQuery:
    """Watermarked SLIDING-window aggregation (window ≠ slide): each
    event contributes to window/slide overlapping windows — the
    moving-rate monitor the tumbling twin can't express. State stays
    bounded by the watermark; each window still emits exactly once
    (append mode). Overlap factor is window/slide (4 here), so state
    and output scale by that constant, not by the stream size."""
    events = read_events_stream(spark, events_path)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # round the DECIMAL then cast (exact HALF_UP) — same rule
            # as windowed_event_counts / the batch twin
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")), 2
            ).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def enriched_windowed_counts(
    spark: SparkSession,
    events_path: str,
    dim: DataFrame,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "enriched_counts",
) -> StreamingQuery:
    """Stream-static enrichment join + windowed rollup: the unbounded
    event stream joins a small static dimension (event_type →
    category) and aggregates per (window, category).

    The static side is re-read and BROADCAST each micro-batch (hinted
    explicitly) — the streaming twin of the batch broadcast-dim joins:
    no shuffle ever touches the stream side for the join, and the
    stateful agg keys on the coarser category domain."""
    events = read_events_stream(spark, events_path)
    enriched = events.join(F.broadcast(dim), "event_type", "left").withColumn(
        "category", F.coalesce(F.col("category"), F.lit("other"))
    )
    agg = (
        enriched.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("category"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("window_start"), "category", "cnt")
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def continuous_index_update(
    spark: SparkSession,
    docs_path: str,
    index_dir: str,
    checkpoint_dir: str,
    query_name: str = "index_update",
) -> StreamingQuery:
    """Continuous search-index maintenance: a file stream of new
    documents folds into the materialized inverted index
    (sources/search_index.py) one micro-batch at a time via
    foreachBatch. Exactly-once effect from at-least-once delivery:
    checkpointed offsets + ``on_existing='skip'`` makes a redelivered
    batch a no-op — same idempotence contract as the upsert sink
    (SURVEY §2.9)."""
    from chillastic_spark.sources.search_index import update_inverted_index

    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_path)
    )

    def fold(batch_df, _batch_id):
        # empty triggers skip the writer lock entirely; every batch
        # contract — exact-copy collapse, the same-id-different-text
        # 'resolve upstream' error, redelivery idempotence — is
        # enforced INSIDE update_inverted_index (one definition; a
        # duplicated pre-check here ran the clash aggregation twice
        # per batch and could silently drift from the real rule)
        if batch_df.isEmpty():
            return
        update_inverted_index(spark, batch_df, index_dir, on_existing="skip")

    return (
        stream.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def percolate_stream(
    spark: SparkSession,
    docs_path: str,
    checkpoint_dir: str,
    stored_queries: "dict[str, list[str]]",
    query_name: str = "percolate_alerts",
) -> StreamingQuery:
    """Streaming percolator: every incoming document is matched
    against the stored conjunctive queries and emits (qid, doc_id)
    alert rows — ES's percolate as its native streaming shape (stored
    queries watch the stream). The query table is a literal broadcast;
    matching is the same postings-join + count==qsize contract as the
    batch `percolate` query (queries/search2.py)."""
    docs = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(docs_path)
    )
    # STATELESS matching: a doc is one row, so the conjunctive match
    # is decidable within that row — each stored query becomes a
    # literal subset test over the doc's distinct-term array. The
    # previous shape (explode → cross-batch dropDuplicates → stateful
    # count==qsize agg) keyed state on every (doc, term) ever seen and
    # grew without bound on a continuous stream, for a dedup only ever
    # needed inside one row.
    doc_terms = F.array_distinct(CF.words("text"))
    # a zero-term query NEVER matches (the batch percolate contract:
    # its postings join produces no group) — without the filter the
    # vacuous subset test would alert on every document
    tests = [
        F.when(
            F.size(
                F.array_except(
                    F.array(*[F.lit(t) for t in terms]), F.col("__dt")
                )
            )
            == 0,
            F.lit(qid),
        )
        for qid, terms in stored_queries.items()
        if terms
    ]
    # no (non-empty) queries → a typed never-matching array, not the
    # void-typed F.array() the sink schema would choke on
    matched = F.array(*tests) if tests else F.array(F.lit(None).cast("string"))
    alerts = (
        docs.select("doc_id", doc_terms.alias("__dt"))
        .select("doc_id", F.explode(matched).alias("qid"))
        .filter(F.col("qid").isNotNull())
        .select("qid", "doc_id")
    )
    return (
        alerts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def incremental_dedup_stream(
    spark: SparkSession,
    stream_dir: str,
    existing: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.25,
    available_now: bool = True,
    max_files_per_trigger: int = 2,
) -> StreamingQuery:
    """Ingest-time near-dedup as a stream: each micro-batch of incoming
    docs is flagged against the STATIC curated corpus with the same
    MinHash banding as ``dedup.minhash_lsh_incremental``, and flags
    (doc_id, match_id, est_jaccard) land under ``out_dir`` as
    per-batch partitions (``batch=<id>``; read with
    ``spark.read.parquet(out_dir)``).

    The existing corpus's signatures and band tables are computed ONCE
    (materialized before the stream starts); each micro-batch only
    hashes its own docs, so per-batch cost scales with the batch.
    Exactly-once effect: the checkpoint makes each source file
    processed once, and a replayed batch OVERWRITES its own partition
    dir (the sibling streams' idempotent-sink rule) — a blind append
    would duplicate every flag row on replay.
    """
    from chillastic_spark.operators import dedup as D

    ex_sig = D.materialize(
        D.minhash_signatures_wide(existing, "doc_id", "text", n, num_perm)
    )
    ex_bands = D.materialize(D.minhash_bands(ex_sig, num_perm, bands))

    stream = (
        spark.readStream.schema(existing.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
    )

    def process(batch_df, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        with batch_scope():  # per-batch pins released after the write
            sig = D.materialize(
                D.minhash_signatures_wide(batch_df, "doc_id", "text", n, num_perm)
            )
            flags = D.minhash_flag_against(
                sig,
                D.minhash_bands(sig, num_perm, bands),
                ex_sig,
                ex_bands,
                num_perm,
                threshold,
            )
            flags.write.mode("overwrite").parquet(
                f"{out_dir.rstrip('/')}/batch={_batch_id}"
            )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _freeze_lm_refs(corpus: DataFrame, b: int) -> "tuple[DataFrame, DataFrame]":
    """Frozen corpus bigram-LM count tables (ctx, big) — ONE
    definition shared by lm_filter_stream and curation_stream, so a
    smoothing/bucketing change can never apply to the standalone
    filter and silently fork the composed pipeline's keep decisions
    (the scoring half is shared via ``_lm_score_batch`` for the same
    reason). Both tables are bounded (≤ b rows) and materialized for
    the stream's lifetime; the corpus-sized bigram expansion is
    aggregated and never pinned."""
    from chillastic_spark.operators import dedup as D
    from chillastic_spark.operators import lm

    grams = lm._bigram_stream(corpus, "doc_id", "text", b)
    ctx = D.materialize(
        grams.groupBy("pb").agg(F.count(F.lit(1)).alias("ctx_ct"))
    )
    big = D.materialize(
        grams.groupBy("bb").agg(F.count(F.lit(1)).alias("big_ct"))
    )
    return ctx, big


def _freeze_drift_ref(
    corpus: DataFrame,
    b: int,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Frozen corpus unigram reference for drift scoring — ONE
    definition shared by drift_stream, curation_stream, AND the batch
    pipeline's input-drift check (same rationale as
    :func:`_freeze_lm_refs`). Bounded at ≤ b rows."""
    from chillastic_spark.operators import importance as IMP
    from chillastic_spark.operators.dedup import materialize

    return materialize(
        IMP.unigram_counts(corpus, group_col, text_col=text_col, buckets=b)
        .groupBy("bkt")
        .agg(F.sum("ct").alias("cct"))
    )


def _lm_score_batch(
    batch_df: DataFrame, ctx: DataFrame, big: DataFrame, b: int,
    nll_keep_max: float,
) -> DataFrame:
    """(doc_id, n_bigrams, nll, keep) for one micro-batch against the
    frozen hashed-bigram LM count tables — the scoring shared by
    lm_filter_stream and curation_stream (ONE definition so the
    composed pipeline can never fork from the standalone filter)."""
    from chillastic_spark.operators import lm

    g = lm._bigram_stream(batch_df, "doc_id", "text", b)
    # the one scoring definition (lm.score_bigrams_against): frozen
    # model — unseen buckets count 0. The bigram stream's marker rows
    # make the aggregate id-complete (short/NULL-text docs read
    # (0, NULL, keep=false)), so no per-micro-batch rejoin is needed
    scored = lm.score_bigrams_against(g, ctx, big, b, frozen=True)
    return scored.select(
        "doc_id",
        "n_bigrams",
        "nll",
        (F.col("nll").isNotNull() & (F.col("nll") <= nll_keep_max)).alias(
            "keep"
        ),
    )


def lm_filter_stream(
    spark: SparkSession,
    stream_dir: str,
    corpus: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    nll_keep_max: float = 10.5,
    buckets: "int | None" = None,
    available_now: bool = True,
    max_files_per_trigger: int = 2,
) -> StreamingQuery:
    """Ingest-time perplexity filtering as a stream: the hashed bigram
    LM (operators/lm.py) is trained ONCE on the STATIC reference
    corpus, its two bounded count tables are materialized before the
    stream starts, and every micro-batch of incoming docs is scored
    against that frozen model — (doc_id, n_bigrams, nll, keep)
    appends to ``out_dir``.

    Freezing the model is the semantics ingest actually wants (score
    new data against the curated distribution, not against itself);
    it is also what makes the stream cheap — per-batch cost is the
    batch's own narrow bigram expansion plus two broadcast joins.
    Exactly once: each micro-batch OVERWRITES its own
    ``batch=<id>`` partition directory under ``out_dir``, so a
    replayed batch rewrites identical files instead of appending
    duplicates; read the flags with ``spark.read.parquet(out_dir)``
    (the batch id surfaces as a partition column).

    Only the two bounded (≤ buckets-row) count tables are
    materialized; the corpus-sized bigram expansion is aggregated in
    two passes and never pinned for the stream's lifetime.
    """
    from chillastic_spark.operators import lm

    b = buckets or lm.LM_BUCKETS
    ctx, big = _freeze_lm_refs(corpus, b)

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
    )

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = _lm_score_batch(batch_df, ctx, big, b, nll_keep_max)
        # idempotent per-batch sink: a replayed batch overwrites its
        # own partition dir instead of appending duplicate flag rows
        out.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _accumulated_sides(
    spark: SparkSession,
    sig_path: str,
    manifest_path: str,
    batch_id: int,
    sig_cols: "list[str]",
) -> "tuple[DataFrame | None, DataFrame | None]":
    """(accumulated signatures, accumulated manifest rows) visible to
    micro-batch ``batch_id`` — ONE definition of the replay rule,
    shared by assembly_stream and curation_stream so a fix can never
    apply to one and silently diverge in the other.

    The rule: only rows from STRICTLY EARLIER batches
    (``batch < batch_id``, the partition column) participate. This
    reproduces attempt 1's inputs exactly on ANY replay:

    * failed-batch retry (checkpoint intact): the batch's own partial
      ``batch=<id>`` output is excluded, so a stale self-signature
      (est 1.0) can't shadow the genuine near-dup match;
    * checkpoint loss with outputs kept (full replay, ids restart at
      0): LATER batches' rows are excluded too — without this, a
      replaying batch 0 could match batch 1+ docs it had never seen
      and adopt reps through them, mutating already-published rows
      (the split-leakage non-idempotence a plain own-id anti-join
      misses).

    A doc id re-ingested in a later batch deliberately KEEPS its
    earlier-batch signature on the match side: the re-ingested copy
    self-matches at est 1.0 and adopts its own published rep — the
    stability contract.
    """
    def _try_read(path: str):
        """None ONLY when the path does not exist yet (first batch).
        Any other read failure (storage hiccup, corrupt footer) must
        FAIL the batch so the normal retry/replay path reprocesses it
        — swallowing it would silently match against the static corpus
        only, commit manifest rows that ignore all earlier batches,
        and never revisit them (the checkpoint advances)."""
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(path)
        except AnalysisException as e:
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                return None
            raise

    acc_sig = _try_read(sig_path)
    if acc_sig is not None:
        acc_sig = acc_sig.filter(F.col("batch") < batch_id).select(sig_cols)
    acc_manifest = _try_read(manifest_path)
    if acc_manifest is not None:
        acc_manifest = acc_manifest.filter(F.col("batch") < batch_id).select(
            "doc_id", "rep_id"
        )
    return acc_sig, acc_manifest


def assembly_stream(
    spark: SparkSession,
    stream_dir: str,
    corpus: DataFrame,
    existing_manifest: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    sig_dir: "str | None" = None,
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.25,
    available_now: bool = True,
    max_files_per_trigger: int = 2,
) -> StreamingQuery:
    """Ingest-time dataset assembly with the FULL cross-history
    leakage guarantee: every micro-batch of incoming docs is
    near-dup-flagged against the static curated corpus AND every
    previously ingested doc (signatures accumulate in ``sig_dir``),
    plus its own in-batch pairs — then split/shard-assigned with the
    stability rule (operators/assembly.assemble_incremental): any
    match adopts the published representative verbatim, in-batch
    clusters co-assign, and only genuinely novel docs hash their own
    id. Published assignments never change; near-dups can never
    straddle splits no matter which micro-batches they arrive in.

    Idempotence: both manifest rows and batch signatures write to
    per-batch ``batch=<id>`` dirs with overwrite, and the accumulated
    sides are restricted to STRICTLY EARLIER batches (the shared
    ``_accumulated_sides`` replay rule), so any replay — failed-batch
    retry or full checkpoint loss — sees attempt 1's inputs exactly
    and rewrites byte-identical files; published rows never change.
    """
    from chillastic_spark.operators import dedup as D
    from chillastic_spark.operators.assembly import assemble_incremental

    sig_dir = sig_dir or out_dir.rstrip("/") + "_sigs"
    ex_sig = D.materialize(
        D.minhash_signatures_wide(corpus, "doc_id", "text", n, num_perm)
    )
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
    )

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        with batch_scope():  # releases every per-batch pin after the
            # writes — including operator-internal ones (component
            # rounds inside assemble_incremental) no caller can reach
            sig = D.materialize(
                D.minhash_signatures_wide(batch_df, "doc_id", "text", n, num_perm)
            )
            acc_sig, acc_manifest = _accumulated_sides(
                spark, sig_dir, out_dir, batch_id, ex_sig.columns
            )
            match_sig = (
                ex_sig if acc_sig is None else ex_sig.unionByName(acc_sig)
            )
            flags = D.minhash_flag_against(
                sig,
                D.minhash_bands(sig, num_perm, bands),
                match_sig,
                D.minhash_bands(match_sig, num_perm, bands),
                num_perm,
                threshold,
            ).select("doc_id", "match_id")
            manifest_side = (
                existing_manifest
                if acc_manifest is None
                else existing_manifest.select("doc_id", "rep_id").unionByName(
                    acc_manifest
                )
            )
            # in-batch pairs from the SAME materialized signatures the
            # flag join uses — minhash_lsh_pairs(batch_df) would
            # re-hash the batch and pin a second signature table
            batch_pairs = D.minhash_pairs_from_signatures(
                sig, num_perm, bands, threshold
            ).select("id_a", "id_b")
            manifest = assemble_incremental(
                batch_df, manifest_side, flags, batch_pairs=batch_pairs
            )
            manifest.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
            sig.write.mode("overwrite").parquet(f"{sig_dir}/batch={batch_id}")

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


MG_STATE_SCHEMA = "tokens array<string>, counts array<long>, decr long, version long"
MG_OUTPUT_SCHEMA = (
    "shard int, token string, est long, err long, version long"
)


def heavy_hitters_stream(
    spark: SparkSession,
    docs_stream_dir: str,
    checkpoint_dir: str,
    docs_schema,
    text_col: str = "text",
    shards: int = 8,
    capacity: int = 64,
    query_name: str = "stream_heavy_hitters",
) -> StreamingQuery:
    """Streaming Misra-Gries heavy hitters over an incoming document
    stream — the continuous twin of ``sketches.heavy_hitter_tokens``.

    Tokens are SHARDED by hash into ``shards`` independent groups, so
    state is K bounded summaries updated in parallel (never one global
    task), each at most ``capacity`` counters. A token maps to exactly
    one shard, so the classic MG guarantee holds per token:
    est ≤ true ≤ est + that shard's decrement total. Each micro-batch
    the shard emits its full counter table stamped with a ``version``
    (update count) — consumers keep the max-version row set per shard.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cap = int(capacity)

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd_

        (shard,) = key
        if state.exists:
            tokens, counts, decr, version = state.get
            counters = dict(zip(tokens, counts))
        else:
            counters, decr, version = {}, 0, 0
        batch: dict = {}
        for pdf in pdfs:
            for t in pdf["token"]:
                batch[t] = batch.get(t, 0) + 1
        for t, c in batch.items():
            counters[t] = counters.get(t, 0) + c
        if len(counters) > cap:
            cut = sorted(counters.values(), reverse=True)[cap]
            counters = {t: c - cut for t, c in counters.items() if c > cut}
            decr += cut
        version += 1
        state.update((list(counters), list(counters.values()), decr, version))
        # ALWAYS carry (shard, err, version) — MG truncation can empty
        # the counter table entirely (every count <= cut), and dropping
        # the emission would leave consumers holding a stale version
        # whose error mass understates the bound. A null-token sentinel
        # row keeps the protocol total.
        toks_out = list(counters) or [None]
        ests_out = list(counters.values()) or [0]
        yield pd_.DataFrame(
            {
                "shard": [shard] * len(toks_out),
                "token": toks_out,
                "est": ests_out,
                "err": [decr] * len(toks_out),
                "version": [version] * len(toks_out),
            }
        )

    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(docs_stream_dir)
    )
    toks = stream.select(
        F.explode(CF.words(F.col(text_col))).alias("token")
    ).filter(
        # same empty-token filter as the batch twin: split('') -> ['']
        # would crown '' a heavy hitter on an empty-doc-rich stream
        F.col("token") != ""
    ).withColumn(
        "shard", F.pmod(F.crc32(F.encode(F.col("token"), "utf-8")), F.lit(shards)).cast("int")
    )
    summaries = toks.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        summaries.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def drift_stream(
    spark: SparkSession,
    stream_dir: str,
    corpus: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    buckets: "int | None" = None,
    available_now: bool = True,
    max_files_per_trigger: int = 2,
) -> StreamingQuery:
    """Ingest-time distribution-drift monitor: the FROZEN reference
    unigram distribution is materialized once from the static corpus
    (one bounded (bkt, cct) table), and every micro-batch of incoming
    docs reports per-source (kl, psi) vs the reference — KL(P_batch ||
    Q_corpus) plus the symmetric PSI, both from one domain pass
    (operators/importance.unigram_drift — the same engine-exact math
    the batch `source_unigram_kl`/`source_unigram_psi` diagnostics
    use, with the reference side frozen instead of self; alarm on PSI
    ~0.1 watch / ~0.25 act). Rising drift on a source = its new data is
    drifting away from the curated distribution; the monitor a
    pipeline watches BEFORE mixing new ingest in.

    Per-batch cost is the batch's own token agg plus bucket-cardinality
    joins (the reference table and totals broadcast). Exactly-once by
    per-batch partition overwrite, same as lm_filter_stream; read with
    ``spark.read.parquet(out_dir)`` (batch id is a partition column).
    """
    from chillastic_spark.operators import importance as IMP
    from chillastic_spark.operators.dedup import materialize

    b = buckets or IMP.DEFAULT_BUCKETS
    ref = _freeze_drift_ref(corpus, b)

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
    )

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        with batch_scope():  # per-batch pins released after the write
            # multiple consumers (group totals + novel-bucket anti-join
            # + domain join) — materialize so the batch's explode+md5
            # token pass runs once, same as the batch twin
            sb = materialize(IMP.unigram_counts(batch_df, "source", buckets=b))
            out = IMP.unigram_drift(sb, ref)  # both KL and PSI, one pass
            out.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def curation_stream(
    spark: SparkSession,
    stream_dir: str,
    corpus: DataFrame,
    existing_manifest: DataFrame,
    out_root: str,
    checkpoint_dir: str,
    nll_keep_max: float = 10.5,
    lm_buckets: "int | None" = None,
    drift_buckets: "int | None" = None,
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.25,
    available_now: bool = True,
    max_files_per_trigger: int = 2,
) -> StreamingQuery:
    """THE composed continuous curation pipeline — the kappa path:
    every micro-batch of raw incoming docs flows through
    ingest → drift monitor → LM quality filter → near-dedup →
    leakage-safe assembly in ONE foreachBatch, each stage the same
    frozen-reference operator as its standalone stream twin:

    * ``drift/batch=<id>``   — per-source (kl, psi) of the RAW batch
      vs the frozen corpus unigram reference (drift_stream math).
    * ``lm_flags/batch=<id>`` — (doc_id, n_bigrams, nll, keep) vs the
      frozen corpus bigram LM (the shared ``_lm_score_batch``, so the
      composed filter can never fork from lm_filter_stream).
    * ``dedup_flags/batch=<id>`` — (doc_id, match_id) best near-dup
      match of each KEPT doc vs the static corpus plus every
      previously KEPT ingested doc. The SAME banded match feeds
      assembly — computed once per batch, not per consumer.
    * ``manifest/batch=<id>`` + ``sigs/batch=<id>`` — leakage-safe
      split/shard rows for kept docs (assembly_stream semantics:
      matches adopt published reps verbatim, in-batch clusters
      co-assign, novel docs hash their own id).

    Only KEPT docs accumulate signatures and manifest rows — a
    quality-dropped doc never becomes a representative, so it can
    never pull a future near-dup into a split.

    Exactly-once across restarts: the checkpoint feeds each source
    file to exactly one batch id, every output is a per-batch
    partition OVERWRITE, and the accumulated signature/manifest sides
    admit only STRICTLY EARLIER batches (the shared
    ``_accumulated_sides`` replay rule) — any replay, including full
    checkpoint loss, sees attempt 1's inputs and rewrites
    byte-identical files.
    """
    from chillastic_spark.operators import dedup as D
    from chillastic_spark.operators import importance as IMP
    from chillastic_spark.operators import lm
    from chillastic_spark.operators.assembly import assemble_incremental

    out_root = out_root.rstrip("/")
    # SEPARATE bucket domains: the LM defaults to 65536 and drift to
    # 4096 — one shared knob silently forked whichever stage it
    # overrode from its standalone twin (16x more bigram collisions
    # change nll keep sets; a changed drift domain changes kl/psi)
    b_lm = lm_buckets or lm.LM_BUCKETS
    b_drift = drift_buckets or IMP.DEFAULT_BUCKETS

    # frozen references, materialized once before the stream starts —
    # the LM and drift references come from the SAME builders as the
    # standalone streams, so the composed model freeze cannot fork
    ctx, big = _freeze_lm_refs(corpus, b_lm)
    drift_ref = _freeze_drift_ref(corpus, b_drift)
    ex_sig = D.materialize(
        D.minhash_signatures_wide(corpus, "doc_id", "text", n, num_perm)
    )

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
    )

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        with batch_scope():  # releases every per-batch pin after the
            # writes — including operator-internal ones (component
            # rounds inside assemble_incremental) no caller can reach
            # 1. drift monitor on the RAW batch (pre-filter: the
            # monitor must see what is ARRIVING, not what survives)
            sb = D.materialize(
                IMP.unigram_counts(batch_df, "source", buckets=b_drift)
            )
            IMP.unigram_drift(sb, drift_ref).write.mode("overwrite").parquet(
                f"{out_root}/drift/batch={batch_id}"
            )
            release(sb)  # drift write was its only consumer; the scope
            # exit would free it anyway, but releasing at last-consumer
            # keeps the batch's PEAK pinned footprint to the frames the
            # remaining stages actually read
            # 2. frozen-LM quality filter — materialized: the scoring
            # (bigram explode + two broadcast joins + agg) feeds the
            # sink AND the kept semi-join; unpinned it would re-execute
            # per downstream action
            flags_lm = D.materialize(
                _lm_score_batch(batch_df, ctx, big, b_lm, nll_keep_max)
            )
            flags_lm.write.mode("overwrite").parquet(
                f"{out_root}/lm_flags/batch={batch_id}"
            )
            kept = D.materialize(
                batch_df.join(
                    flags_lm.filter(F.col("keep")).select("doc_id"),
                    "doc_id", "left_semi",
                )
            )  # feeds isEmpty + signatures + in-batch pairs + assembly
            if persist_mode() in ("local", "reliable"):
                # eager pins: kept is fully computed by materialize(),
                # so the LM flags frame is dead here — free it early.
                # Under lazy 'disk' pinning kept partitions may still
                # recompute through flags_lm, so the scope exit owns it
                # (DISK_ONLY blocks cost no executor memory anyway).
                release(flags_lm)
            if kept.isEmpty():
                return
            # 3. near-dedup of kept docs vs corpus + previously-kept
            # ingest
            sig = D.materialize(
                D.minhash_signatures_wide(kept, "doc_id", "text", n, num_perm)
            )
            acc_sig, acc_manifest = _accumulated_sides(
                spark, f"{out_root}/sigs", f"{out_root}/manifest", batch_id,
                ex_sig.columns,
            )
            match_sig = (
                ex_sig if acc_sig is None else ex_sig.unionByName(acc_sig)
            )
            dedup_flags = D.minhash_flag_against(
                sig,
                D.minhash_bands(sig, num_perm, bands),
                match_sig,
                D.minhash_bands(match_sig, num_perm, bands),
                num_perm,
                threshold,
            ).select("doc_id", "match_id")
            dedup_flags = D.materialize(dedup_flags)  # sink + assembly
            dedup_flags.write.mode("overwrite").parquet(
                f"{out_root}/dedup_flags/batch={batch_id}"
            )
            # 4. leakage-safe assembly of the kept docs, reusing the
            # flags; in-batch pairs from the SAME materialized
            # signatures as the flag join (no second signature table)
            manifest_side = (
                existing_manifest
                if acc_manifest is None
                else existing_manifest.select("doc_id", "rep_id").unionByName(
                    acc_manifest
                )
            )
            batch_pairs = D.minhash_pairs_from_signatures(
                sig, num_perm, bands, threshold
            ).select("id_a", "id_b")
            manifest = assemble_incremental(
                kept, manifest_side, dedup_flags, batch_pairs=batch_pairs
            )
            manifest.write.mode("overwrite").parquet(
                f"{out_root}/manifest/batch={batch_id}"
            )
            sig.write.mode("overwrite").parquet(
                f"{out_root}/sigs/batch={batch_id}"
            )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
