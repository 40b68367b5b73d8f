"""Curation pipeline integration: planted junk/dup/near-dup docs must be
pruned at the right stage, survivors chunked."""
from chillastic_spark.pipelines import CurationConfig, curate

GOOD = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "in the warm sun and the birds sing in the tall green trees near the river"
)
NEAR = GOOD.replace("lazy dog", "lazy cow")
LONG_GOOD = " ".join(
    f"sentence{i} about meaningful topic{i % 7} with varied vocabulary{i % 11}"
    for i in range(30)
)


def test_curation_pipeline(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),        # exact dup → pruned at exact stage
        (3, NEAR),        # near dup of 1 → pruned at near stage
        (4, LONG_GOOD),   # survives; long enough to chunk into >1 window
        (5, "tiny doc"),  # < min_tokens → pruned at quality gate
        (6, "a a a a a a a a a a a a"),  # degenerate vocab → low quality
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    chunks, report = curate(df, CurationConfig(min_quality=0.35, min_tokens=8))

    assert report.input_docs == 6
    assert report.after_quality_gate == 4      # 5 (short) and 6 (junk) gone
    assert report.after_exact_dedup == 3       # 2 collapsed into 1
    assert report.after_near_dedup == 2        # 3 collapsed into 1
    survivors = {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()}
    assert survivors == {1, 4}
    assert report.chunks == chunks.count()
    # the long doc got multiple overlapping windows
    n4 = chunks.filter("doc_id = 4").count()
    assert n4 >= 2


REPETITIVE = " ".join(["spam ham"] * 40)  # dup-bigram frac ~1, varied enough to pass quality?


def test_repetition_gate_and_decontamination(spark):
    rows = [
        (1, GOOD),
        (4, LONG_GOOD),
        (7, REPETITIVE),  # dup_bigram_frac ≈ 1 → repetition gate prunes
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    cfg = CurationConfig(
        min_quality=0.0, min_tokens=8,
        max_dup_bigram_frac=0.7, max_top_tok_frac=0.6,
    )
    # benchmark shares a 5-gram window with GOOD → doc 1 is tainted
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "bid: long, text: string"
    )
    chunks, report = curate(df, cfg, benchmark=bench)
    survivors = {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()}
    assert survivors == {4}
    assert report.after_quality_gate == 2          # repetitive doc 7 gone
    assert report.after_decontamination == 1       # GOOD doc 1 gone
    # without a benchmark the field stays None and doc 1 survives
    chunks2, report2 = curate(df, cfg)
    assert report2.after_decontamination is None
    assert {r["doc_id"] for r in chunks2.select("doc_id").distinct().collect()} == {1, 4}


def test_curation_null_and_empty_text_dropped_not_crashed(spark):
    rows = [(1, GOOD), (2, None), (3, ""), (4, "   ")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    chunks, report = curate(df, CurationConfig(min_quality=0.1, min_tokens=2))
    survivors = {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()}
    assert survivors == {1}
    assert report.input_docs == 4


def test_dsir_selection_and_mixture_sampling(spark):
    """End-to-end: DSIR keeps the most target-like half; the mixture
    gate samples each source at its solved rate. Both stages are
    deterministic — a re-run returns the identical chunk set."""
    import pyspark.sql.functions as F

    from chillastic_spark.tables import load

    d = load(spark, "/root/testdata/sf0.001", "documents")
    cfg = CurationConfig(
        min_quality=0.0,
        min_tokens=1,
        dsir_keep_frac=0.5,
        mixture_budget=20_000,
    )
    mixture = {f"src{i}": (i % 4) + 1 for i in range(20)}
    chunks, report = curate(
        d, cfg, dsir_target=F.col("lang") == "en", mixture=mixture
    )
    assert report.after_dsir_selection is not None
    assert report.after_mixture_sampling is not None
    # dsir cut keeps ~half the deduped pool
    assert (
        abs(report.after_dsir_selection - report.after_near_dedup * 0.5)
        <= report.after_near_dedup * 0.05 + 1
    )
    # the gate can only shrink the pool
    assert report.after_mixture_sampling <= report.after_dsir_selection
    assert 0 < report.after_mixture_sampling
    # the selected pool is enriched toward the target language
    kept = {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()}
    pool = {r["doc_id"]: r["lang"] for r in d.select("doc_id", "lang").collect()}
    en_kept = sum(1 for i in kept if pool[i] == "en") / len(kept)
    en_pool = sum(1 for v in pool.values() if v == "en") / len(pool)
    assert en_kept > en_pool
    # determinism: identical rows on a re-run
    chunks2, report2 = curate(
        d, cfg, dsir_target=F.col("lang") == "en", mixture=mixture
    )
    assert report2.as_dict() == report.as_dict()
    a = sorted(map(tuple, chunks.collect()))
    b = sorted(map(tuple, chunks2.collect()))
    assert a == b


def test_mixture_with_empty_pool_does_not_crash(spark):
    """An over-strict gate can leave zero docs before the mixture
    stage; the report must come back with zeros, not an error."""
    rows = [(1, "a a"), (2, "b b")]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "source", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("src0")
    )
    chunks, report = curate(
        df,
        CurationConfig(min_quality=0.99, min_tokens=50),
        mixture={"src0": 1},
    )
    assert report.after_quality_gate == 0
    assert report.after_mixture_sampling == 0
    assert chunks.count() == 0


def test_assemble_splits_and_shards(spark):
    """Assembly stage: near-dups share a split; shards conserve the
    corpus; pairs can be injected to skip the second signature pass."""
    from pyspark.sql import functions as F

    from chillastic_spark.pipelines import assemble

    rows = [(i, f"doc {i} body " + GOOD, f"src{i % 3}") for i in range(1, 40)]
    rows += [(100, GOOD, "src0"), (101, NEAR, "src1")]  # near-dup pair
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")

    # inject the pair list (what curate's dedup stage already computed)
    pairs = spark.createDataFrame([(100, 101)], "id_a: long, id_b: long")
    manifest, summary = assemble(df, pairs=pairs)
    rows_m = {r["doc_id"]: r for r in manifest.collect()}

    assert len(rows_m) == df.count()
    # the leakage invariant: the planted near-dup pair shares rep + split
    assert rows_m[100]["rep_id"] == rows_m[101]["rep_id"] == 100
    assert rows_m[100]["split"] == rows_m[101]["split"]
    # every doc assigned exactly one split and a shard in range
    assert all(r["split"] in ("train", "val", "test") for r in rows_m.values())
    assert all(0 <= r["shard"] < 8 for r in rows_m.values())
    # summary conserves docs and tokens
    s = summary.agg(F.sum("n_docs"), F.sum("n_tokens")).collect()[0]
    total_tokens = df.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).collect()[0][0]
    assert s[0] == df.count() and s[1] == total_tokens
    # deterministic: a second run yields the identical manifest
    manifest2, _ = assemble(df, pairs=pairs)
    assert manifest.exceptAll(manifest2).count() == 0


def test_assemble_computes_pairs_when_absent(spark):
    from chillastic_spark.pipelines import assemble

    rows = [(1, GOOD, "a"), (2, NEAR, "a"), (3, LONG_GOOD, "b")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    manifest, _ = assemble(df)  # pairs computed via MinHash-LSH internally
    m = {r["doc_id"]: r for r in manifest.collect()}
    assert m[1]["split"] == m[2]["split"]  # near dups co-assigned
    assert m[1]["rep_id"] == m[2]["rep_id"] == 1


def test_write_sharded_layout(spark, tmp_path):
    """write_sharded materializes exactly one parquet file per
    (split, shard) directory and round-trips all rows with the
    manifest's own hash assignment."""
    import glob

    from pyspark.sql import functions as F

    from chillastic_spark.operators.assembly import shard_of, write_sharded
    from chillastic_spark.pipelines import assemble

    rows = [(i, f"doc {i} text " + GOOD, f"src{i % 3}") for i in range(1, 60)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    manifest, _ = assemble(
        df, pairs=spark.createDataFrame([], "id_a: long, id_b: long")
    )
    out = str(tmp_path / "dataset")
    write_sharded(manifest.join(df.select("doc_id", "text"), "doc_id"), out)

    dirs = sorted(glob.glob(f"{out}/split=*/shard=*"))
    assert dirs, "no shard directories written"
    for d in dirs:
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, (d, files)  # ONE file per shard

    back = spark.read.parquet(out)
    assert back.count() == 59
    # every row sits in the dir its hash assigns
    mism = back.filter(
        (F.col("shard") != shard_of(F.col("doc_id")))
    ).count()
    assert mism == 0
    # splits in dirs match the manifest
    got = {(r["doc_id"], r["split"]) for r in back.select("doc_id", "split").collect()}
    want = {(r["doc_id"], r["split"]) for r in manifest.collect()}
    assert got == want


def test_assemble_incremental_inherits_splits(spark):
    """Cross-ingest leakage invariant: a new doc near-duplicating an
    existing doc lands in the existing doc's split; unmatched new docs
    get exactly the assignment a from-scratch run would give them."""
    from pyspark.sql import functions as F

    from chillastic_spark.operators.assembly import (
        assemble_incremental,
        shard_of,
        split_of,
    )
    from chillastic_spark.pipelines import assemble

    existing = spark.createDataFrame(
        [(i, f"existing doc {i} " + GOOD, "src0") for i in range(1, 30)],
        "doc_id: long, text: string, source: string",
    )
    manifest, _ = assemble(
        existing, pairs=spark.createDataFrame([], "id_a: long, id_b: long")
    )

    new_docs = spark.createDataFrame(
        [
            (100, NEAR, "src1"),          # near-dups existing doc 7 (say)
            (101, "fresh totally new content here", "src1"),
        ],
        "doc_id: long, text: string, source: string",
    )
    flags = spark.createDataFrame([(100, 7)], "doc_id: long, match_id: long")
    inc = {r["doc_id"]: r for r in
           assemble_incremental(new_docs, manifest, flags).collect()}

    ex = {r["doc_id"]: r for r in manifest.collect()}
    # matched doc inherits doc 7's rep and split
    assert inc[100]["rep_id"] == ex[7]["rep_id"]
    assert inc[100]["split"] == ex[7]["split"]
    # unmatched doc: identical to the from-scratch hash assignment
    want_split = spark.range(1).select(
        split_of(F.lit(101)).alias("s"), shard_of(F.lit(101)).alias("k")
    ).collect()[0]
    assert inc[101]["rep_id"] == 101
    assert inc[101]["split"] == want_split["s"]
    assert inc[101]["shard"] == want_split["k"]


def test_assemble_incremental_multiple_matches_take_min_rep(spark):
    from chillastic_spark.operators.assembly import assemble_incremental

    manifest = spark.createDataFrame(
        [(1, "src0", 1, "train", 0), (2, "src0", 2, "test", 3)],
        "doc_id: long, source: string, rep_id: long, split: string, shard: int",
    )
    new_docs = spark.createDataFrame(
        [(50, "x", "src1")], "doc_id: long, text: string, source: string"
    )
    flags = spark.createDataFrame(
        [(50, 1), (50, 2)], "doc_id: long, match_id: long"
    )
    r = assemble_incremental(new_docs, manifest, flags).collect()[0]
    assert r["rep_id"] == 1  # smallest existing rep adopted


def test_assembly_stream_single_batch_matches_twin(spark, tmp_path):
    """With one micro-batch the stream must equal the batch operator
    called with the same flags + in-batch pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from chillastic_spark.operators import dedup as D
    from chillastic_spark.operators.assembly import assemble_incremental
    from chillastic_spark.pipelines import assemble
    from chillastic_spark.streaming import assembly_stream

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    existing = corpus.filter(F.col("doc_id") % 3 != 0)
    manifest, _ = assemble(existing)
    manifest = manifest.localCheckpoint()

    incoming = corpus.filter(F.col("doc_id") % 3 == 0)
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    pq.write_table(
        pa.Table.from_pandas(incoming.toPandas(), preserve_index=False),
        str(stream_dir / "part-0000.parquet"),
    )

    out_dir = str(tmp_path / "manifest_inc")
    q = assembly_stream(
        spark, str(stream_dir), existing, manifest, out_dir,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        (r["doc_id"], r["rep_id"], r["split"], r["shard"])
        for r in spark.read.parquet(out_dir).collect()
    }
    flags = D.minhash_lsh_incremental(
        corpus, F.col("doc_id") % 3 == 0
    ).select("doc_id", "match_id")
    batch_pairs = D.minhash_lsh_pairs(incoming).select("id_a", "id_b")
    want = {
        (r["doc_id"], r["rep_id"], r["split"], r["shard"])
        for r in assemble_incremental(
            incoming, manifest, flags, batch_pairs=batch_pairs
        ).collect()
    }
    assert got == want and len(want) == incoming.count()
    # matched docs share their existing match's split
    ex = {r["doc_id"]: r["split"] for r in manifest.collect()}
    matched = {r["doc_id"]: r["match_id"] for r in flags.collect()}
    streamed = {t[0]: t[2] for t in got}
    hits = 0
    for did, mid in matched.items():
        if did in streamed and mid in ex:
            assert streamed[did] == ex[mid]
            hits += 1
    assert hits > 0


def test_assembly_stream_cross_batch_co_assignment(spark, tmp_path):
    """THE cross-history leakage guarantee: near-dup docs arriving in
    DIFFERENT micro-batches (and matching nothing static) must land
    in the same split; in-batch near-dup pairs must co-assign too;
    published rows from earlier batches never change."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chillastic_spark.pipelines import assemble
    from chillastic_spark.streaming import assembly_stream

    filler = " ".join(f"w{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(i, f"static doc {i} " + filler, "src0") for i in range(1, 10)],
        "doc_id: long, text: string, source: string",
    )
    manifest, _ = assemble(
        corpus, pairs=spark.createDataFrame([], "id_a: long, id_b: long")
    )
    manifest = manifest.localCheckpoint()

    novel = "completely novel content " + " ".join(f"z{i}" for i in range(40))
    batches = [
        # batch 0: doc 100 (novel) + an in-batch near-dup pair 102/103
        [(100, novel, "srcA"),
         (102, "pair body " + " ".join(f"q{i}" for i in range(30)) + " aa", "srcA"),
         (103, "pair body " + " ".join(f"q{i}" for i in range(30)) + " ab", "srcA")],
        # batch 1: doc 101 near-dups doc 100 from the PREVIOUS batch
        [(101, novel + " tail", "srcB")],
    ]
    stream_dir = tmp_path / "inc"
    stream_dir.mkdir()
    for i, rows in enumerate(batches):
        pq.write_table(
            pa.Table.from_pydict(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "lang": ["en"] * len(rows),
                    "source": [r[2] for r in rows],
                    "n_chars": [len(r[1]) for r in rows],
                }
            ),
            str(stream_dir / f"part-{i:04d}.parquet"),
        )

    out_dir = str(tmp_path / "m")
    q = assembly_stream(
        spark,
        str(stream_dir),
        corpus.select("doc_id", "text", "source"),
        manifest,
        out_dir,
        str(tmp_path / "ckpt"),
    )
    # one file per micro-batch so 100 and 101 land in different batches
    q.awaitTermination(180)

    rows = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert set(rows) == {100, 101, 102, 103}
    # cross-batch: 101 adopted 100's published rep and split
    assert rows[101]["rep_id"] == rows[100]["rep_id"]
    assert rows[101]["split"] == rows[100]["split"]
    # in-batch: the 102/103 pair co-assigned (cluster rep = min id)
    assert rows[102]["rep_id"] == rows[103]["rep_id"] == 102
    assert rows[102]["split"] == rows[103]["split"]


def test_assembly_stream_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch (failed attempt already wrote its
    batch=<id> signature + manifest dirs) must rewrite IDENTICAL rows:
    the doc's own stale signature in sig_dir must not shadow its
    genuine near-dup match against the published corpus (which would
    make it hash its own id → split leakage). Simulated by wiping the
    checkpoint and re-running over the same out/sig dirs."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chillastic_spark.pipelines import assemble
    from chillastic_spark.streaming import assembly_stream

    filler = " ".join(f"w{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(i, f"static doc {i} " + filler, "src0") for i in range(1, 10)],
        "doc_id: long, text: string, source: string",
    )
    manifest, _ = assemble(
        corpus, pairs=spark.createDataFrame([], "id_a: long, id_b: long")
    )
    manifest = manifest.localCheckpoint()
    pub = {r["doc_id"]: r for r in manifest.collect()}

    stream_dir = tmp_path / "inc"
    stream_dir.mkdir()
    # doc 100 near-dups published doc 1
    pq.write_table(
        pa.Table.from_pydict(
            {
                "doc_id": [100],
                "text": ["static doc 1 " + filler + " tail"],
                "source": ["srcA"],
            }
        ),
        str(stream_dir / "part-0000.parquet"),
    )

    out_dir = str(tmp_path / "m")
    sig_dir = str(tmp_path / "sigs")

    def run():
        q = assembly_stream(
            spark,
            str(stream_dir),
            corpus,
            manifest,
            out_dir,
            str(tmp_path / "ckpt"),
            sig_dir=sig_dir,
        )
        q.awaitTermination(120)
        return {r["doc_id"]: r.asDict() for r in spark.read.parquet(out_dir).collect()}

    first = run()
    assert first[100]["rep_id"] == pub[1]["rep_id"]  # genuine match adopted
    assert first[100]["split"] == pub[1]["split"]

    # replay: checkpoint gone, batch=0 dirs still populated from attempt 1
    shutil.rmtree(str(tmp_path / "ckpt"))
    second = run()
    assert second == first


def test_curate_input_drift(spark):
    """drift_reference attaches per-source KL of the RAW batch to the
    report; a batch that IS the reference scores minimal drift, a
    vocabulary-shifted batch scores strictly higher."""
    ref = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = CurationConfig(min_quality=0.0, min_tokens=1)

    same = ref.limit(100)
    _, rep_same = curate(same, cfg, drift_reference=ref)
    assert rep_same.input_drift is not None
    srcs = {r["source"] for r in same.select("source").distinct().collect()}
    assert set(rep_same.input_drift) == srcs
    assert all(v >= 0.0 for v in rep_same.input_drift.values())

    import pyspark.sql.functions as F
    shifted = same.withColumn(
        "text", F.concat(F.lit("zq9 zq9 zq9 zq9 zq9 zq9 zq9 zq9 "), F.col("text"))
    )
    _, rep_shift = curate(shifted, cfg, drift_reference=ref)
    common = set(rep_same.input_drift) & set(rep_shift.input_drift)
    assert common
    # novel-vocabulary mass is properly in the union smoothing domain,
    # so KL stays a real divergence: non-negative everywhere and
    # raised by the injection (mean — per-source strictness can wobble
    # at ~5 docs/source where smoothing dominates)
    assert all(v >= 0.0 for v in rep_shift.input_drift.values())
    mean_same = sum(rep_same.input_drift[s] for s in common) / len(common)
    mean_shift = sum(rep_shift.input_drift[s] for s in common) / len(common)
    assert mean_shift > mean_same

    # no reference → field stays None (report shape unchanged)
    _, rep_none = curate(same, cfg)
    assert rep_none.input_drift is None


def test_curation_stream_end_to_end(spark, tmp_path):
    """THE composed kappa path (ingest -> drift -> LM filter -> dedup
    -> leakage-safe assembly) e2e:

    * stage outputs pin EXACTLY to their batch twins (lm flags via the
      shared scorer over all stream docs at once; drift via the
      per-file unigram_drift twin),
    * quality-dropped docs leave NO trace downstream (no signature, no
      manifest row — they can never become representatives),
    * near-dup adoption works against the static corpus AND across
      micro-batches via accumulated signatures,
    * a full replay (checkpoint wiped, outputs kept) rewrites
      byte-identical content, and a RESTART with the checkpoint intact
      processes only new files while published rows stay frozen.
    """
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from chillastic_spark.operators import importance as IMP
    from chillastic_spark.operators import lm
    from chillastic_spark.operators.dedup import materialize
    from chillastic_spark.pipelines import assemble
    from chillastic_spark.streaming import _lm_score_batch, curation_stream

    filler = " ".join(f"w{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(i, f"static doc {i} " + filler, "src0") for i in range(1, 10)],
        "doc_id: long, text: string, source: string",
    )
    manifest, _ = assemble(
        corpus, pairs=spark.createDataFrame([], "id_a: long, id_b: long")
    )
    manifest = manifest.localCheckpoint()
    pub = {r["doc_id"]: r for r in manifest.collect()}

    junk = lambda tag: " ".join(f"{tag}{i}" for i in range(30))
    prefix12 = "static doc 3 " + " ".join(f"w{i}" for i in range(12))
    batches = [
        # batch 0: corpus near-dup (100), junk (102), novel-but-fluent
        # substring doc (104 — low nll, below the 0.6 jaccard bar)
        [(100, "static doc 1 " + filler + " tail", "sA"),
         (102, junk("zq"), "sA"),
         (104, prefix12, "sB")],
        # batch 1: another corpus near-dup + another junk
        [(101, "static doc 2 " + filler + " tail", "sB"),
         (106, junk("xk"), "sA")],
    ]
    stream_dir = tmp_path / "inc"
    stream_dir.mkdir()

    def write_file(i, rows):
        pq.write_table(
            pa.Table.from_pydict(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "source": [r[2] for r in rows],
                }
            ),
            str(stream_dir / f"part-{i:04d}.parquet"),
        )

    for i, rows in enumerate(batches):
        write_file(i, rows)

    out_root = str(tmp_path / "cur")
    ckpt = str(tmp_path / "ckpt")
    NLL_MAX, THRESH, PERMS = 7.0, 0.6, 32

    def run():
        q = curation_stream(
            spark, str(stream_dir), corpus, manifest, out_root, ckpt,
            nll_keep_max=NLL_MAX, lm_buckets=4096, drift_buckets=4096,
            num_perm=PERMS,
            threshold=THRESH, max_files_per_trigger=1,
        )
        q.awaitTermination(240)

    def snapshot():
        out = {}
        for sub in ("drift", "lm_flags", "dedup_flags", "manifest", "sigs"):
            df = spark.read.parquet(f"{out_root}/{sub}")
            out[sub] = frozenset(
                tuple(sorted(r.asDict().items())) for r in df.collect()
            )
        return out

    run()
    snap1 = snapshot()

    # --- lm flags == the shared scorer over ALL stream docs at once
    # (frozen model => batch-independent)
    all_docs = spark.createDataFrame(
        [r for rows in batches for r in rows], corpus.schema
    )
    grams = lm._bigram_stream(corpus, "doc_id", "text", 4096)
    ctx = materialize(grams.groupBy("pb").agg(F.count(F.lit(1)).alias("ctx_ct")))
    big = materialize(grams.groupBy("bb").agg(F.count(F.lit(1)).alias("big_ct")))
    twin = {
        r["doc_id"]: (r["n_bigrams"], r["nll"], r["keep"])
        for r in _lm_score_batch(all_docs, ctx, big, 4096, NLL_MAX).collect()
    }
    got_lm = {
        r["doc_id"]: (r["n_bigrams"], r["nll"], r["keep"])
        for r in spark.read.parquet(f"{out_root}/lm_flags").collect()
    }
    assert got_lm == twin
    assert {d for d, v in got_lm.items() if v[2]} == {100, 101, 104}
    assert {d for d, v in got_lm.items() if not v[2]} == {102, 106}

    # --- drift rows == the per-file batch twin (order-insensitive)
    ref = materialize(
        IMP.unigram_counts(corpus, "source", buckets=4096)
        .groupBy("bkt").agg(F.sum("ct").alias("cct"))
    )
    want_drift = set()
    for rows in batches:
        bdf = spark.createDataFrame(rows, corpus.schema)
        sb = IMP.unigram_counts(bdf, "source", buckets=4096)
        for r in IMP.unigram_drift(sb, ref).collect():
            want_drift.add((r["source"], r["n_tokens"], r["kl"], r["psi"]))
    got_drift = {
        (r["source"], r["n_tokens"], r["kl"], r["psi"])
        for r in spark.read.parquet(f"{out_root}/drift").collect()
    }
    assert got_drift == want_drift

    # --- dedup flags: corpus matches only; the novel doc is unflagged
    flags = {
        r["doc_id"]: r["match_id"]
        for r in spark.read.parquet(f"{out_root}/dedup_flags").collect()
    }
    assert flags == {100: 1, 101: 2}

    # --- manifest: kept docs only; adoption vs published reps; the
    # dropped junk left no signature either
    rows = {r["doc_id"]: r for r in spark.read.parquet(f"{out_root}/manifest").collect()}
    assert set(rows) == {100, 101, 104}
    assert rows[100]["rep_id"] == pub[1]["rep_id"]
    assert rows[100]["split"] == pub[1]["split"]
    assert rows[101]["rep_id"] == pub[2]["rep_id"]
    assert rows[104]["rep_id"] == 104
    sig_ids = {
        r["doc_id"] for r in spark.read.parquet(f"{out_root}/sigs").collect()
    }
    assert sig_ids == {100, 101, 104}

    # --- full replay: wipe the checkpoint, keep outputs; every file
    # reprocesses and must rewrite byte-identical content
    shutil.rmtree(ckpt)
    run()
    assert snapshot() == snap1

    # --- restart with checkpoint intact: only the NEW file processes;
    # 105 near-dups 104 (a previously-ingested KEPT doc) and must
    # adopt its rep + split across batches — the leakage guarantee
    write_file(2, [(105, prefix12 + " w12", "sB")])
    run()
    rows2 = {r["doc_id"]: r for r in spark.read.parquet(f"{out_root}/manifest").collect()}
    assert set(rows2) == {100, 101, 104, 105}
    for d in (100, 101, 104):  # published rows frozen
        assert rows2[d].asDict() == rows[d].asDict()
    assert rows2[105]["rep_id"] == rows2[104]["rep_id"] == 104
    assert rows2[105]["split"] == rows2[104]["split"]
    flags2 = {
        r["doc_id"]: r["match_id"]
        for r in spark.read.parquet(f"{out_root}/dedup_flags").collect()
    }
    assert flags2 == {100: 1, 101: 2, 105: 104}


def test_assembly_stream_full_replay_no_future_contamination(spark, tmp_path):
    """THE checkpoint-loss replay hazard: when outputs are kept but the
    checkpoint is wiped, a replaying batch 0 must NOT match against
    batch 1's accumulated signatures/manifest rows (strictly-earlier
    rule). Construction: A (batch 0) is novel -> rep A. B (batch 1)
    overlaps BOTH A and corpus doc C, with C the stronger match -> rep
    C. Without the batch<batch_id rule, replayed A would flag to B and
    adopt C, silently migrating a published row across splits."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chillastic_spark.pipelines import assemble
    from chillastic_spark.streaming import assembly_stream

    c_text = " ".join(f"c{i}" for i in range(1, 21))
    corpus = spark.createDataFrame(
        [(9, c_text, "src0")], "doc_id: long, text: string, source: string"
    )
    manifest, _ = assemble(
        corpus, pairs=spark.createDataFrame([], "id_a: long, id_b: long")
    )
    manifest = manifest.localCheckpoint()
    pub = {r["doc_id"]: r for r in manifest.collect()}

    a_text = " ".join(f"a{i}" for i in range(1, 21))
    # deterministic minhash ests at (n=2, 32 perms, 16 bands):
    # est(A,B)=0.25 >= threshold, est(C,B)=0.5625 -> C is B's best match
    b_text = (
        " ".join(f"a{i}" for i in range(1, 15))
        + " "
        + " ".join(f"c{i}" for i in range(1, 17))
    )
    stream_dir = tmp_path / "inc"
    stream_dir.mkdir()
    for i, (doc_id, text) in enumerate([(100, a_text), (200, b_text)]):
        pq.write_table(
            pa.Table.from_pydict(
                {"doc_id": [doc_id], "text": [text], "source": ["sA"]}
            ),
            str(stream_dir / f"part-{i:04d}.parquet"),
        )

    out_dir = str(tmp_path / "m")

    def run():
        q = assembly_stream(
            spark, str(stream_dir), corpus, manifest, out_dir,
            str(tmp_path / "ckpt"),
            n=2, num_perm=32, bands=16, threshold=0.2,
            max_files_per_trigger=1,
        )
        q.awaitTermination(180)
        return {
            r["doc_id"]: r.asDict()
            for r in spark.read.parquet(out_dir).collect()
        }

    # premise: A WOULD flag to B if B's signature were visible to it —
    # i.e. without the strictly-earlier-batch rule, the replay below
    # would contaminate A through B
    from chillastic_spark.operators import dedup as D

    sig_a = D.minhash_signatures_wide(
        spark.createDataFrame([(100, a_text, "sA")], corpus.schema),
        "doc_id", "text", 2, 32)
    sig_b = D.minhash_signatures_wide(
        spark.createDataFrame([(200, b_text, "sA")], corpus.schema),
        "doc_id", "text", 2, 32)
    premise = D.minhash_flag_against(
        sig_a, D.minhash_bands(sig_a, 32, 16),
        sig_b, D.minhash_bands(sig_b, 32, 16), 32, 0.2,
    ).collect()
    assert [(r["doc_id"], r["match_id"]) for r in premise] == [(100, 200)]

    first = run()
    assert set(first) == {100, 200}
    assert first[100]["rep_id"] == 100  # A novel
    # B's stronger overlap is the corpus doc -> published rep adopted
    assert first[200]["rep_id"] == pub[9]["rep_id"]

    shutil.rmtree(str(tmp_path / "ckpt"))
    second = run()
    assert second == first  # esp. A still rep 100, not contaminated


def test_incremental_assembly_order_invariant_co_assignment(spark):
    """THE leakage guarantee under arrival-order permutation: docs of
    one near-dup cluster must land in the SAME split no matter which
    ingest batches they arrive in or in what order — and rows published
    by earlier ingests never change when later ones arrive. Simulated
    as sequential batch ingests (the stream's exact computation:
    flag vs corpus ∪ previously-ingested, assemble, append), using
    exact-dup clusters (jaccard 1.0) so minhash recall is certain.

    Rep VALUES may differ between orders (first-arrival wins — the
    documented price of never rewriting published rows); co-assignment
    may not.
    """
    import itertools

    from pyspark.sql import functions as F

    from chillastic_spark.operators import dedup as D
    from chillastic_spark.operators.assembly import assemble_incremental
    from chillastic_spark.pipelines import assemble

    filler = " ".join(f"w{i}" for i in range(25))
    corpus = spark.createDataFrame(
        [(i, f"static doc {i} " + filler, "src0") for i in range(1, 6)],
        "doc_id: long, text: string, source: string",
    )
    base_manifest, _ = assemble(
        corpus, pairs=spark.createDataFrame([], "id_a: long, id_b: long")
    )
    base_manifest = base_manifest.select("doc_id", "rep_id", "split").localCheckpoint()

    # three exact-dup clusters, one member per ingest batch
    cluster_text = {
        "X": "cluster ex " + " ".join(f"x{i}" for i in range(25)),
        "Y": "cluster wy " + " ".join(f"y{i}" for i in range(25)),
        "Z": "cluster ze " + " ".join(f"z{i}" for i in range(25)),
    }
    batches = {
        0: [(100, cluster_text["X"]), (110, cluster_text["Y"])],
        1: [(101, cluster_text["X"]), (111, cluster_text["Y"])],
        2: [(102, cluster_text["X"]), (120, cluster_text["Z"])],
    }
    schema = "doc_id: long, text: string, source: string"
    n, perms, bands, thr = 3, 16, 4, 0.5

    ex_sig = D.minhash_signatures_wide(corpus, "doc_id", "text", n, perms)

    def ingest_sequence(order):
        manifest_rows = {}  # doc_id -> (rep_id, split)
        acc_sig = ex_sig
        acc_manifest = base_manifest
        for b in order:
            bdf = spark.createDataFrame(
                [(i, t, "sA") for i, t in batches[b]], schema
            )
            sig = D.minhash_signatures_wide(bdf, "doc_id", "text", n, perms)
            flags = D.minhash_flag_against(
                sig, D.minhash_bands(sig, perms, bands),
                acc_sig, D.minhash_bands(acc_sig, perms, bands),
                perms, thr,
            ).select("doc_id", "match_id")
            pairs = D.minhash_lsh_pairs(
                bdf, id_col="doc_id", text_col="text",
                n=n, num_perm=perms, bands=bands, threshold=thr,
            ).select("id_a", "id_b")
            out = assemble_incremental(bdf, acc_manifest, flags, batch_pairs=pairs)
            new_rows = {
                r["doc_id"]: (r["rep_id"], r["split"]) for r in out.collect()
            }
            # published rows never change: ids never repeat here, and
            # prior entries must be untouched by construction
            assert not (set(new_rows) & set(manifest_rows))
            manifest_rows.update(new_rows)
            acc_sig = acc_sig.unionByName(sig).localCheckpoint()
            acc_manifest = acc_manifest.unionByName(
                out.select("doc_id", "rep_id", "split")
            ).localCheckpoint()
        return manifest_rows

    splits_by_cluster_per_order = {}
    for order in itertools.permutations([0, 1, 2]):
        rows = ingest_sequence(order)
        assert set(rows) == {100, 101, 102, 110, 111, 120}
        # co-assignment within each cluster, whatever the order
        assert rows[100][1] == rows[101][1] == rows[102][1], order
        assert rows[110][1] == rows[111][1], order
        splits_by_cluster_per_order[order] = (
            rows[100][1], rows[110][1], rows[120][1]
        )
    # the SPLIT each cluster lands in is itself order-invariant: every
    # member adopts the first-arrived member's hash, and any first
    # member of the same cluster hashes the same text-independent id?
    # No — rep ids differ by arrival, so splits may differ BETWEEN
    # orders; the invariant is within-order co-assignment (asserted
    # above). Record the observed variety for documentation.
    assert len(splits_by_cluster_per_order) == 6


def test_curation_stream_mid_batch_crash_exactly_once(spark, tmp_path, monkeypatch):
    """R5 verdict #5: the composed kappa pipeline killed MID-BATCH —
    after the drift/lm_flags/dedup_flags writes but before the
    manifest/sigs writes — must, on restart, replay the batch and
    converge to byte-identical outputs vs an uninjected twin run.
    foreachBatch commits the source offsets only after process()
    returns, so the partially-written batch re-runs and every partial
    partition is overwritten."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from chillastic_spark.operators import assembly as ASM
    from chillastic_spark.pipelines import assemble
    from chillastic_spark.streaming import curation_stream

    filler = " ".join(f"w{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(i, f"static doc {i} " + filler, "src0") for i in range(1, 6)],
        "doc_id: long, text: string, source: string",
    )
    manifest, _ = assemble(
        corpus, pairs=spark.createDataFrame([], "id_a: long, id_b: long")
    )
    manifest = manifest.localCheckpoint()

    junk = " ".join(f"zq{i}" for i in range(30))
    batches = [
        [(100, "static doc 1 " + filler + " tail", "sA"), (102, junk, "sA")],
        [(101, "static doc 2 " + filler + " tail", "sB")],
    ]
    stream_dir = tmp_path / "inc"
    stream_dir.mkdir()
    for i, rows in enumerate(batches):
        pq.write_table(
            pa.Table.from_pydict(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "source": [r[2] for r in rows],
                }
            ),
            str(stream_dir / f"part-{i:04d}.parquet"),
        )

    def run(out_root, ckpt):
        q = curation_stream(
            spark, str(stream_dir), corpus, manifest, out_root, ckpt,
            nll_keep_max=7.0, lm_buckets=4096, drift_buckets=4096,
            num_perm=32, threshold=0.6,
            max_files_per_trigger=1,
        )
        q.awaitTermination(240)

    def snapshot(out_root):
        out = {}
        for sub in ("drift", "lm_flags", "dedup_flags", "manifest", "sigs"):
            df = spark.read.parquet(f"{out_root}/{sub}")
            out[sub] = frozenset(
                tuple(sorted(r.asDict().items())) for r in df.collect()
            )
        return out

    # --- clean twin (no injection)
    clean_root, clean_ckpt = str(tmp_path / "clean"), str(tmp_path / "ck_clean")
    run(clean_root, clean_ckpt)
    want = snapshot(clean_root)

    # --- injected run: assemble_incremental (stage 4 of process(),
    # called AFTER three sinks already wrote) dies once
    real = ASM.assemble_incremental
    state = {"crashes": 0}

    def bomb(*a, **kw):
        if state["crashes"] == 0:
            state["crashes"] += 1
            raise RuntimeError("injected mid-batch crash")
        return real(*a, **kw)

    monkeypatch.setattr(ASM, "assemble_incremental", bomb)
    inj_root, inj_ckpt = str(tmp_path / "inj"), str(tmp_path / "ck_inj")
    with _pytest.raises(Exception, match="injected mid-batch crash"):
        run(inj_root, inj_ckpt)
    assert state["crashes"] == 1
    # partial mid-batch state is really on disk: early sinks wrote,
    # later sinks did not
    import os

    assert os.path.isdir(f"{inj_root}/drift/batch=0")
    assert os.path.isdir(f"{inj_root}/lm_flags/batch=0")
    assert not os.path.isdir(f"{inj_root}/manifest/batch=0")

    # --- restart with the same checkpoint: the uncommitted batch
    # replays (overwriting partials), the rest streams through
    run(inj_root, inj_ckpt)
    assert snapshot(inj_root) == want
