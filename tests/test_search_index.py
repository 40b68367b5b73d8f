"""Inverted-index tests: golden equivalence with the scan-time BM25,
term-pushdown in the served plan, and the sorted-postings skipping
layout."""
import glob

import pyarrow.parquet as pq

from chillastic_spark.queries.search import TERMS, bm25_topk
from chillastic_spark.sources.search_index import (
    bm25_search_index,
    build_inverted_index,
)
from chillastic_spark.tables import load

SF = "/root/testdata/sf0.001"


def _build(spark, tmp_path):
    idx = str(tmp_path / "idx")
    stats = build_inverted_index(spark, load(spark, SF, "documents"), idx)
    return idx, stats


def test_index_serves_identical_bm25(spark, tmp_path):
    idx, stats = _build(spark, tmp_path)
    assert stats["n_docs"] == load(spark, SF, "documents").count()
    got = [tuple(r) for r in bm25_search_index(spark, idx, TERMS, k=20).collect()]
    want = [tuple(r) for r in bm25_topk(spark, SF).collect()]
    assert got == want


def test_index_plan_pushes_term_filter(spark, tmp_path):
    idx, _ = _build(spark, tmp_path)
    df = bm25_search_index(spark, idx, TERMS, k=20)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters: [In(term" in plan
    # and the served query never touches the documents table
    assert "documents.parquet" not in plan


def test_postings_files_have_disjoint_term_ranges(spark, tmp_path):
    idx, _ = _build(spark, tmp_path)
    ranges = []
    for f in glob.glob(idx + "/postings/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "term"
        )
        st = [md.row_group(g).column(col).statistics for g in range(md.num_row_groups)]
        ranges.append((min(s.min for s in st), max(s.max for s in st)))
    assert len(ranges) >= 2
    ranges.sort()
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_incremental_update_equals_full_rebuild(spark, tmp_path):
    from pyspark.sql import functions as F

    from chillastic_spark.sources.search_index import update_inverted_index

    docs = load(spark, SF, "documents")
    inc_dir = str(tmp_path / "inc")
    build_inverted_index(spark, docs.filter(F.col("doc_id") < 400), inc_dir)
    stats_inc = update_inverted_index(
        spark, docs.filter(F.col("doc_id") >= 400), inc_dir
    )
    full_dir = str(tmp_path / "full")
    stats_full = build_inverted_index(spark, docs, full_dir)
    # the corpus stats must equal a full rebuild's; n_docs_added is the
    # update's batch-scoped observability counter (r10), not a corpus stat
    assert stats_inc.pop("n_docs_added") == 100
    assert stats_inc == stats_full
    got = [tuple(r) for r in bm25_search_index(spark, inc_dir, TERMS, k=20).collect()]
    want = [tuple(r) for r in bm25_search_index(spark, full_dir, TERMS, k=20).collect()]
    assert got == want

    import pytest

    with pytest.raises(ValueError, match="already indexed"):
        update_inverted_index(spark, docs.filter(F.col("doc_id") == 0), inc_dir)


def test_continuous_index_update_converges_to_full_rebuild(spark, tmp_path):
    """Stream two document files into the index via foreachBatch; the
    result must equal a batch rebuild, and replaying the stream with a
    fresh checkpoint must be a no-op (idempotent redelivery)."""
    from pyspark.sql import functions as F

    from chillastic_spark.streaming import continuous_index_update

    docs = load(spark, SF, "documents")
    idx = str(tmp_path / "cidx")
    build_inverted_index(spark, docs.filter(F.col("doc_id") < 100), idx)

    stream_dir = tmp_path / "docstream"
    stream_dir.mkdir()
    docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 300)).coalesce(
        1
    ).write.parquet(str(stream_dir / "f1"))
    docs.filter(F.col("doc_id") >= 300).coalesce(1).write.parquet(
        str(stream_dir / "f2")
    )

    q = continuous_index_update(
        spark, str(stream_dir / "*"), idx, str(tmp_path / "ck1"), query_name="cidx1"
    )
    q.awaitTermination(240)

    full = str(tmp_path / "fullidx")
    build_inverted_index(spark, docs, full)
    got = [tuple(r) for r in bm25_search_index(spark, idx, TERMS, k=20).collect()]
    want = [tuple(r) for r in bm25_search_index(spark, full, TERMS, k=20).collect()]
    assert got == want

    # replay with a fresh checkpoint: every doc already indexed → no-op
    q2 = continuous_index_update(
        spark, str(stream_dir / "*"), idx, str(tmp_path / "ck2"), query_name="cidx2"
    )
    q2.awaitTermination(240)
    again = [tuple(r) for r in bm25_search_index(spark, idx, TERMS, k=20).collect()]
    assert again == want


def test_wildcard_index_pushes_prefix_predicate(spark, tmp_path):
    from chillastic_spark.sources.search_index import wildcard_search_index

    idx, _ = _build(spark, tmp_path)
    df = wildcard_search_index(spark, idx, "sc", k=10)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters: [IsNotNull(term), StringStartsWith(term,sc)]" in plan
    rows = df.collect()
    assert rows and all(
        t.startswith("sc") for r in rows for t in r["matched_terms"].split(",")
    )


def test_multi_index_store_search(spark, store_factory):
    """BM25 across a store index pattern: results span matching
    indices only, scores verified against a local reference."""
    import math

    from chillastic_spark.sources.search_index import bm25_search_store

    corpora = {
        "logs_2024": ["table scan join", "scan scan table", "join join join"],
        "logs_2025": ["table table scan", "filter sort merge"],
        "metrics_x": ["table scan join table"],
    }
    docs = {
        ix: [
            {"_id": f"d{i}", "_type": "doc", "_source": {"text": t}}
            for i, t in enumerate(texts)
        ]
        for ix, texts in corpora.items()
    }
    store = store_factory("searchstore", docs)
    got = bm25_search_store(
        spark, store, "logs_*", ["table", "scan"], k=10
    ).collect()
    assert {r["_index"] for r in got} <= {"logs_2024", "logs_2025"}

    # local reference over the logs_* corpus
    flat = [
        (ix, f"d{i}", t.split())
        for ix, texts in corpora.items()
        if ix.startswith("logs_")
        for i, t in enumerate(texts)
    ]
    n, avgdl = len(flat), sum(len(w) for *_, w in flat) / len(flat)
    dfreq = {
        t: sum(1 for *_, w in flat if t in w) for t in ("table", "scan")
    }
    want = {}
    for ix, did, w in flat:
        s = 0.0
        for t in ("table", "scan"):
            tf = w.count(t)
            if not tf:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += round(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(w) / avgdl)), 9)
        if s:
            want[(ix, did)] = round(math.floor(s * 1e6 + 0.5) / 1e6, 6)
    got_map = {(r["_index"], r["_id"]): r["bm25"] for r in got}
    assert got_map == want


def test_phrase_from_index_matches_scan_time_phrase(spark, tmp_path):
    from chillastic_spark.queries.search import PHRASE as P2, phrase_search
    from chillastic_spark.sources.search_index import phrase_search_index

    idx, _ = _build(spark, tmp_path)

    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search_index(spark, idx, P2, k=10000).collect()
    }
    want = {
        r["doc_id"]: r["n_occurrences"] for r in phrase_search(spark, SF).collect()
    }
    assert got == want


def test_empty_corpus_index_bootstraps(spark, tmp_path):
    """An index built from an EMPTY corpus must build (no part files →
    the naive re-read crashed on schema inference) and accept its
    first incremental update."""
    from chillastic_spark.sources.search_index import update_inverted_index

    docs = load(spark, SF, "documents")
    idx = str(tmp_path / "empty-idx")
    stats = build_inverted_index(spark, docs.limit(0), idx)
    assert stats["n_docs"] == 0
    stats = update_inverted_index(
        spark, docs.limit(30), idx, on_existing="skip"
    )
    assert stats["n_docs"] == 30
    assert bm25_search_index(spark, idx, TERMS, k=5).count() > 0


def test_interrupted_update_swap_rolls_forward(spark, tmp_path):
    """A crash between the postings swap and the stats writes left the
    index silently inconsistent (new postings, stale df/avgdl). The
    journal makes every entry point complete the interrupted swap, so
    serving equals the fully-updated index."""
    import json
    import os

    from chillastic_spark.sources.search_index import update_inverted_index

    docs = load(spark, SF, "documents")
    idx = str(tmp_path / "crash-idx")
    build_inverted_index(spark, docs.filter("doc_id <= 300"), idx)
    # full reference: the same update completed normally
    ref = str(tmp_path / "ref-idx")
    build_inverted_index(spark, docs.filter("doc_id <= 300"), ref)
    update_inverted_index(spark, docs.filter("doc_id > 300"), ref)
    want = [tuple(r) for r in bm25_search_index(spark, ref, TERMS, k=20).collect()]

    # simulate the crash: run the update, then REWIND term_stats +
    # stats.json to their pre-update state while re-planting the
    # journal the crashed process would have left behind
    import shutil

    pre_ts = str(tmp_path / "pre-ts")
    shutil.copytree(os.path.join(idx, "term_stats"), pre_ts)
    pre_stats = json.load(open(os.path.join(idx, "stats.json")))
    update_inverted_index(spark, docs.filter("doc_id > 300"), idx)
    post_stats = json.load(open(os.path.join(idx, "stats.json")))
    ts_tmp = os.path.join(idx, "term_stats.tmp-deadbeef")
    shutil.move(os.path.join(idx, "term_stats"), ts_tmp)
    shutil.copytree(pre_ts, os.path.join(idx, "term_stats"))
    json.dump(pre_stats, open(os.path.join(idx, "stats.json"), "w"))
    json.dump(
        {
            "post_tmp": os.path.join(idx, "postings.tmp-gone"),
            "ts_tmp": ts_tmp,
            "stats": post_stats,
        },
        open(os.path.join(idx, "swap-journal.json"), "w"),
    )
    # serving must roll the swap forward and match the clean index
    got = [tuple(r) for r in bm25_search_index(spark, idx, TERMS, k=20).collect()]
    assert got == want
    assert not os.path.exists(os.path.join(idx, "swap-journal.json"))
    assert json.load(open(os.path.join(idx, "stats.json"))) == post_stats


def test_served_bm25_matches_scan_time_with_degenerate_docs(spark, tmp_path):
    """Review finding: index stats were derived from postings (which
    exclude null-/empty-text docs) while scan-time BM25 counts every
    doc — different N and avgdl broke the bit-identical claim on any
    corpus with degenerate docs. Stats now come from the input
    universe, so served == scan-time even here."""
    from pyspark.sql import functions as F

    from chillastic_spark.sources.search_index import (
        bm25_search_index,
        update_inverted_index,
    )

    base = load(spark, SF, "documents").limit(40)
    weird = spark.createDataFrame(
        [(900001, None), (900002, ""), (900003, "   ")],
        "doc_id long, text string",
    )
    corpus = base.select("doc_id", "text").unionByName(weird)
    idx = str(tmp_path / "idx")
    stats = build_inverted_index(spark, corpus, idx)
    assert stats["n_docs"] == 43  # every doc counted, degenerate or not

    from chillastic_spark.sources.search_index import bm25_rank

    want = [
        (r["doc_id"], r["bm25"], r["n_terms_matched"])
        for r in bm25_rank(corpus, ["doc_id"], "text", TERMS, k=10).collect()
    ]
    got = [
        (r["doc_id"], r["bm25"], r["n_terms_matched"])
        for r in bm25_search_index(spark, idx, TERMS, k=10).collect()
    ]
    assert got == want

    # incremental add keeps the same universe accounting
    more = spark.createDataFrame(
        [(900004, "tail doc " + " ".join(TERMS)), (900005, None)],
        "doc_id long, text string",
    )
    stats2 = update_inverted_index(spark, more, idx)
    assert stats2["n_docs"] == 45
    full = corpus.unionByName(more)
    want2 = [
        (r["doc_id"], r["bm25"])
        for r in bm25_rank(full, ["doc_id"], "text", TERMS, k=10).collect()
    ]
    got2 = [
        (r["doc_id"], r["bm25"])
        for r in bm25_search_index(spark, idx, TERMS, k=10).collect()
    ]
    assert got2 == want2


def test_update_rejects_within_batch_text_conflicts(spark, tmp_path):
    """Review finding: duplicate doc_ids within ONE batch sailed past
    the batch-vs-index guard and permanently corrupted tf/df/stats.
    Identical copies collapse; conflicting text raises in every mode."""
    import pytest

    from chillastic_spark.sources.search_index import update_inverted_index

    idx = str(tmp_path / "idx")
    build_inverted_index(spark, load(spark, SF, "documents").limit(5), idx)
    twice = spark.createDataFrame(
        [(800001, "same text here"), (800001, "same text here")],
        "doc_id long, text string",
    )
    stats = update_inverted_index(spark, twice, idx)
    assert stats["n_docs"] == 6  # collapsed to one doc

    conflict = spark.createDataFrame(
        [(800002, "version one"), (800002, "version two")],
        "doc_id long, text string",
    )
    for mode in ("skip", "error"):
        with pytest.raises(ValueError, match="different text"):
            update_inverted_index(spark, conflict, idx, on_existing=mode)


def test_rebuild_discards_stale_crashed_update_journal(spark, tmp_path):
    """Review finding: build neither recovered nor cleared a stale
    swap-journal, so the next entry point 'rolled forward' a crashed
    update OVER the fresh rebuild. A rebuild now discards the stale
    journal and its tmp dirs."""
    import json
    import os

    from chillastic_spark.sources.search_index import bm25_search_index

    docs = load(spark, SF, "documents").limit(30)
    idx = str(tmp_path / "idx")
    build_inverted_index(spark, docs, idx)
    want = [
        (r["doc_id"], r["bm25"])
        for r in bm25_search_index(spark, idx, TERMS, k=5).collect()
    ]

    # simulate a crashed update: journal + tmp dirs pointing at garbage
    post_tmp = os.path.join(idx, "postings.tmp-dead")
    ts_tmp = os.path.join(idx, "term_stats.tmp-dead")
    os.makedirs(post_tmp)
    os.makedirs(ts_tmp)
    with open(os.path.join(idx, "swap-journal.json"), "w") as f:
        json.dump(
            {"post_tmp": post_tmp, "ts_tmp": ts_tmp,
             "stats": {"n_docs": 0, "avgdl": 0.0, "sum_dl": 0.0}},
            f,
        )
    build_inverted_index(spark, docs, idx)  # rebuild must win
    assert not os.path.exists(os.path.join(idx, "swap-journal.json"))
    assert not os.path.exists(post_tmp) and not os.path.exists(ts_tmp)
    got = [
        (r["doc_id"], r["bm25"])
        for r in bm25_search_index(spark, idx, TERMS, k=5).collect()
    ]
    assert got == want
