"""Streaming drift monitor: per-batch KL vs the frozen corpus must
equal the batch twin (operators/importance.unigram_kl) computed on
exactly the docs of each micro-batch."""
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _twin(spark, corpus, batch_pdf):
    from chillastic_spark.operators import importance as IMP

    ref = (
        IMP.unigram_counts(corpus, "source")
        .groupBy("bkt")
        .agg(F.sum("ct").alias("cct"))
    )
    sb = IMP.unigram_counts(
        spark.createDataFrame(batch_pdf, schema=corpus.schema), "source"
    )
    return IMP.unigram_drift(sb, ref)


def test_drift_stream_matches_batch_twin(spark, tmp_path):
    from chillastic_spark.streaming import drift_stream

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pdf = corpus.toPandas()

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    # three files of distinct compositions; maxFilesPerTrigger=1 makes
    # each file one micro-batch, so per-file twins are the ground truth
    files = [pdf.iloc[0:137], pdf.iloc[137:291], pdf.iloc[291:500]]
    for i, chunk in enumerate(files):
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            str(stream_dir / f"part-{i:04d}.parquet"),
        )

    out_dir = str(tmp_path / "drift")
    q = drift_stream(
        spark,
        str(stream_dir),
        corpus,
        out_dir,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(120), "drift stream did not finish in 120s"

    got = spark.read.parquet(out_dir)
    batches = [r["batch"] for r in got.select("batch").distinct().collect()]
    assert len(batches) == 3
    got_sets = {
        frozenset(
            (r["source"], r["n_tokens"], r["kl"], r["psi"])
            for r in got.filter(F.col("batch") == b_id).collect()
        )
        for b_id in batches
    }
    want_sets = {
        frozenset(
            (r["source"], r["n_tokens"], r["kl"], r["psi"])
            for r in _twin(spark, corpus, chunk).collect()
        )
        for chunk in files
    }
    assert got_sets == want_sets

    # the full corpus streamed against itself scores every source at
    # the batch self-diagnostic's value when the batch IS the corpus
    whole = _twin(spark, corpus, pdf).collect()
    assert all(r["kl"] >= 0.0 for r in whole)


import pytest


@pytest.mark.parametrize("mode", ["local", "disk"])
def test_stream_releases_per_batch_cache(spark, tmp_path, monkeypatch, mode):
    """Long-running-stream leak guard: per-batch materialized
    intermediates must be RELEASED after each micro-batch — under BOTH
    persist modes (localCheckpoint blocks live in sc.persistentRdds,
    disk blocks in the SQL cache manager; release() must free each)
    the persisted-RDD count after a 3-batch run must equal the
    pre-stream count plus the stream's frozen reference only, not grow
    with the batch count."""
    from chillastic_spark.streaming import drift_stream

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pdf = corpus.limit(90).toPandas()
    stream_dir = tmp_path / "inc"
    stream_dir.mkdir()
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[i * 30 : (i + 1) * 30], preserve_index=False),
            str(stream_dir / f"part-{i:04d}.parquet"),
        )

    monkeypatch.setenv("CHILLASTIC_PERSIST", mode)
    n_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    q = drift_stream(
        spark, str(stream_dir), corpus, str(tmp_path / "out"),
        str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    assert q.awaitTermination(120), "drift stream did not finish in 120s"
    n_after = spark.sparkContext._jsc.getPersistentRDDs().size()
    # exactly ONE new persistent entry: the frozen reference table.
    # 3 leaked per-batch tables would make this n_before + 4.
    assert n_after <= n_before + 1, (n_before, n_after)
    assert spark.read.parquet(str(tmp_path / "out")).count() > 0


@pytest.mark.parametrize("mode", ["local", "reliable"])
def test_curation_stream_releases_per_batch_cache(spark, tmp_path, monkeypatch, mode):
    """The composed stream pins five per-batch intermediates (drift
    counts, lm flags, kept, signatures, dedup flags) — all must be
    released per batch: after 3 batches the persistent-RDD count may
    exceed the baseline only by the FOUR frozen references (LM ctx/big,
    drift ref, corpus signatures). Parameterized over the single-node
    pin mode AND the cluster mode (reliable = DataFrame.checkpoint) —
    the latter drives the eager-release branch for the LM flags and
    proves the composed pipeline runs under executor-loss-safe
    materialization end-to-end."""
    from chillastic_spark.pipelines import assemble
    from chillastic_spark.streaming import curation_stream

    corpus = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "source")
        .limit(120)
    )
    manifest, _ = assemble(
        corpus.withColumn("text", F.coalesce("text", F.lit(""))),
        pairs=spark.createDataFrame([], "id_a: long, id_b: long"),
    )
    manifest = manifest.localCheckpoint()
    pdf = corpus.toPandas()
    stream_dir = tmp_path / "inc"
    stream_dir.mkdir()
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(
                pdf.iloc[i * 40 : (i + 1) * 40], preserve_index=False
            ),
            str(stream_dir / f"part-{i:04d}.parquet"),
        )

    monkeypatch.setenv("CHILLASTIC_PERSIST", mode)
    n_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    q = curation_stream(
        spark, str(stream_dir), corpus, manifest,
        str(tmp_path / "cur"), str(tmp_path / "ckpt"),
        lm_buckets=512, drift_buckets=512, max_files_per_trigger=1,
    )
    assert q.awaitTermination(240), "curation stream did not finish in 240s"
    n_after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert n_after <= n_before + 4, (n_before, n_after)
    assert spark.read.parquet(str(tmp_path / "cur") + "/manifest").count() > 0
