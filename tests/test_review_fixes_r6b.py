"""Regression tests for the round-6 mid-layer review findings:

1. functions.words trimmed only ASCII spaces — a trailing newline (the
   most common document shape in scraped corpora) yielded a phantom ''
   edge token, skewing token counts, LM bigrams, and drift unigrams.
2. functions.fingerprint hashed trim-then-collapse, so two documents
   identical up to a terminal newline got DIFFERENT fingerprints.
3. chunking allowed stride > size: tokens were skipped and the final
   window reported a NEGATIVE n_chunk_tokens.
4. chunk_text_udtf used Python str.strip()/\\s (Unicode-aware) against
   the expression path's Java \\s — divergent rows on edge whitespace.
5. read_jsonl/read_csv cached the ENTIRE input to serve the quarantine
   split — at the module's own 100 TB design point that materialises
   the corpus; now only corrupt rows are ever cached.
6. importance.unigram_counts counted '' as a token for empty docs,
   contradicting the module's own dsir convention.
7. es_options pushed {"lt": 0} for max_size=0 where the reference (and
   scan_request) treat falsy maxSize as "no range body" — a transfer
   that silently copies zero documents.
8. write_bucketed resolved unqualified table names to <warehouse>/<t>,
   ignoring the session's current database — the stale-location guard
   cleaned the wrong path exactly when needed.
9. registry._load parsed the persisted JSON and split keys OUTSIDE the
   per-entry guard — corrupt JSON or a slashless key wedged Engine
   construction, the exact failure the code promised to survive.
10. registry.load_errors was write-only dead state: no API surface read
    it and remove() never cleared it.
11. tables.load treated ANY bigint ts as epoch-nanos (div 1000) — a
    genuine int64 column shrank 1000x with no error.
"""
import os

import pytest
from pyspark.sql import functions as F

from chillastic_spark import functions as CF

EDGY = [
    "hello world\n",
    "",
    "  ",
    "\t a  b \r\n",
    "a b",
    " x",
    "one\ttwo\nthree ",
]


def test_words_strips_all_edge_whitespace(spark):
    """Finding 1: no phantom '' edge tokens; Spark == DuckDB."""
    import duckdb

    df = spark.createDataFrame([(t,) for t in EDGY], "text string")
    got = [r.w for r in df.select(CF.words("text").alias("w")).collect()]
    assert got[0] == ["hello", "world"]
    assert got[1] == [""] and got[2] == [""]  # empty-doc convention
    assert got[3] == ["a", "b"]
    assert got[6] == ["one", "two", "three"]
    con = duckdb.connect()
    for t, w in zip(EDGY, got):
        (duck,) = con.execute(
            f"select {CF.words_sql('?')}", [t]
        ).fetchone()
        assert duck == w, (t, duck, w)


def test_fingerprint_ignores_terminal_newline(spark):
    """Finding 2: same doc with/without trailing newline — one
    fingerprint; DuckDB twin agrees."""
    import duckdb

    df = spark.createDataFrame(
        [("a b",), ("a b\n",), ("\ta  B \r\n",), ("",), ("  ",)],
        "text string",
    )
    got = [r.f for r in df.select(CF.fingerprint("text").alias("f")).collect()]
    assert got[0] == got[1] == got[2]  # normalised to 'a b'
    assert got[3] == got[4]  # empty and whitespace-only agree
    con = duckdb.connect()
    for t, f in zip(["a b", "a b\n", "\ta  B \r\n", "", "  "], got):
        (duck,) = con.execute(
            f"select {CF.fingerprint_sql('?')}", [t]
        ).fetchone()
        assert duck == f, (t, duck, f)


def test_chunking_rejects_stride_beyond_size(spark):
    """Finding 3: stride > size would skip tokens and emit negative
    n_chunk_tokens — both surfaces refuse up front."""
    from chillastic_spark.operators.chunking import (
        chunk_documents,
        chunk_text_udtf,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, size=2, stride=100)
    with pytest.raises(ValueError, match="stride"):
        chunk_text_udtf(size=2, stride=100)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, size=2, stride=0)


def test_chunk_surfaces_agree_on_edge_whitespace(spark):
    """Findings 1+4: newline-terminated and whitespace-edged docs chunk
    identically through the expression path and the UDTF, with no
    phantom-token counts."""
    from chillastic_spark.operators.chunking import (
        chunk_documents,
        chunk_text_udtf,
    )

    rows = [(i, t) for i, t in enumerate(EDGY)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    expr = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(df, size=3, stride=2).collect()
    }
    spark.udtf.register("chunk_edge_t", chunk_text_udtf(3, 2))
    df.createOrReplaceTempView("edge_docs_t")
    udtf = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n)
        for r in spark.sql(
            "SELECT doc_id, c.* FROM edge_docs_t, LATERAL chunk_edge_t(text) AS c"
        ).collect()
    }
    assert expr == udtf
    # 'hello world\n' = 2 real tokens, one chunk, count 2 (was 3)
    assert expr[(0, 0)] == ("hello world", 2)
    assert all(n >= 0 for _, n in expr.values())


def test_unigram_counts_skips_empty_token(spark):
    """Finding 6: an empty/whitespace-only doc contributes NO unigram
    counts (the dsir '' convention)."""
    from chillastic_spark.operators.importance import unigram_counts

    df = spark.createDataFrame(
        [("s1", "a b"), ("s2", ""), ("s2", "   \n")],
        "source string, text string",
    )
    got = unigram_counts(df, "source", buckets=64).collect()
    assert {r.source for r in got} == {"s1"}
    assert sum(r.ct for r in got) == 2


def test_read_jsonl_never_caches_the_corpus(spark, tmp_path):
    """Finding 5: the good split must read straight from source (no
    InMemoryRelation anywhere in its plan); quarantine still returns
    exactly the corrupt lines."""
    from chillastic_spark.sources.jsonl import read_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text('{"a": 1}\nnot json\n{"a": 2}\n{"a": 3}\n')
    good, quarantine = read_jsonl(spark, str(p), "a bigint")
    plan = good._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" not in plan, plan
    assert sorted(r.a for r in good.collect()) == [1, 2, 3]
    assert [r[0] for r in quarantine.collect()] == ["not json"]


def test_read_csv_never_caches_the_corpus(spark, tmp_path):
    from chillastic_spark.sources.jsonl import read_csv

    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,x\n2,y\nnot,a,valid,row\n")
    good, quarantine = read_csv(spark, str(p), "a bigint, b string")
    plan = good._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" not in plan, plan
    assert sorted((r.a, r.b) for r in good.collect()) == [(1, "x"), (2, "y")]
    assert [r[0] for r in quarantine.collect()] == ["not,a,valid,row"]


def test_es_options_falsy_max_size_means_unbounded():
    """Finding 7: max_size=0 (the reference's falsy-maxSize quirk)
    disables the range body instead of pushing lt:0 (zero matches);
    the body, when present, matches scan_request's exactly."""
    import json

    from chillastic_spark.sources.elasticsearch import es_options, scan_request

    cases = [(-1, -1), (0, 0), (0, -1), (None, None), (0, 5), (2, 9), (0, 0.5)]
    for mn, mx in cases:
        opts = es_options("h", min_size=mn, max_size=mx)
        req = scan_request("i", min_size=mn, max_size=mx)
        assert ("es.query" in opts) == ("body" in req), (mn, mx, opts)
        if "body" in req:
            assert json.loads(opts["es.query"]) == req["body"], (mn, mx)


def test_write_bucketed_resolves_current_database(spark, tmp_path):
    """Finding 8: with a non-default current database and a stale
    leftover directory at the table's REAL location, write_bucketed
    must clean the right path and succeed."""
    from chillastic_spark.operators.bucketing import write_bucketed

    spark.sql("CREATE DATABASE IF NOT EXISTS r6bdb")
    prev = spark.catalog.currentDatabase()
    spark.catalog.setCurrentDatabase("r6bdb")
    try:
        loc = spark.catalog.getDatabase("r6bdb").locationUri.removeprefix("file:")
        stale = os.path.join(loc, "r6btbl")
        os.makedirs(stale, exist_ok=True)
        with open(os.path.join(stale, "leftover"), "w") as f:
            f.write("x")
        df = spark.range(10).withColumnRenamed("id", "k")
        write_bucketed(df, "r6btbl", "k", num_buckets=2)
        assert spark.table("r6btbl").count() == 10
    finally:
        spark.catalog.setCurrentDatabase(prev)
        spark.sql("DROP TABLE IF EXISTS r6bdb.r6btbl")
        spark.sql("DROP DATABASE IF EXISTS r6bdb CASCADE")


def test_registry_survives_corrupt_and_malformed_state(tmp_path):
    """Findings 9+10: corrupt JSON quarantines the file (bytes kept,
    error surfaced, service starts); a slashless key is preserved
    verbatim across saves; remove() clears its load_errors entry."""
    import json as _json

    from chillastic_spark.registry import Mutators

    state = str(tmp_path / "state")
    os.makedirs(state)
    path = os.path.join(state, "mutators.json")

    # -- corrupt JSON: engine must start, bytes must survive
    with open(path, "w") as f:
        f.write('{"truncated": ')
    m = Mutators(state_dir=state)
    assert "__file__" in m.load_errors
    corrupts = [p for p in os.listdir(state) if ".corrupt-" in p]
    assert len(corrupts) == 1
    with open(os.path.join(state, corrupts[0])) as f:
        assert f.read() == '{"truncated": '

    # -- malformed key: preserved verbatim through a save
    good_src = (
        'TYPE = "data"\n'
        "def predicate(doc, args):\n    return True\n"
        "def mutate(doc, args):\n    return doc\n"
    )
    with open(path, "w") as f:
        _json.dump({"badkey": "whatever source", "ns1/ok": good_src}, f)
    m = Mutators(state_dir=state)
    assert "badkey" in m.load_errors
    assert m.exists("ok", "ns1")
    m.add("extra", good_src, namespace="ns1")  # triggers a save
    with open(path) as f:
        saved = _json.load(f)
    assert saved["badkey"] == "whatever source"  # not dropped
    # -- remove clears the error record and the orphan source
    m.remove("badkey")
    assert "badkey" not in m.load_errors
    m.add("extra2", good_src, namespace="ns1")
    with open(path) as f:
        assert "badkey" not in _json.load(f)


def test_registry_load_error_cleared_by_remove(tmp_path):
    """A no-longer-compiling persisted source is quarantined at load;
    DELETE clears both the source and the error record."""
    import json as _json

    from chillastic_spark.registry import Mutators

    state = str(tmp_path / "state")
    os.makedirs(state)
    with open(os.path.join(state, "mutators.json"), "w") as f:
        _json.dump({"ns1/broken": "import os  # forbidden"}, f)
    m = Mutators(state_dir=state)
    assert "ns1/broken" in m.load_errors
    assert not m.exists("broken", "ns1")
    m.remove("broken", "ns1")
    assert m.load_errors == {}
    with open(os.path.join(state, "mutators.json")) as f:
        assert _json.load(f) == {}


def test_events_loader_leaves_raw_int64_ts_alone(spark, tmp_path):
    """tables.load must NOT guess nanos for a genuine int64 ts column —
    only a footer-proven timestamp[ns] gets the div-1000 conversion."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chillastic_spark.tables import load

    sf = str(tmp_path)
    micros = 1_700_000_000_000_000  # ~2023 in epoch-micros
    pq.write_table(
        pa.table({"ts": pa.array([micros], type=pa.int64()), "v": [1.0]}),
        os.path.join(sf, "events.parquet"),
    )
    got = load(spark, sf, "events").collect()[0]
    assert got.ts == micros  # untouched bigint, not shrunk 1000x
