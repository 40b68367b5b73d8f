"""Batch-10 operator tests: packing manifest vs a local replay,
percentile-gate keep fraction, time-weighted average vs numpy, OHLC vs
local brute force, and the Misra-Gries heavy-hitter bound."""
import numpy as np
import pyspark.sql.functions as F

from chillastic_spark.operators.sketches import heavy_hitter_tokens
from chillastic_spark.queries.analytics6 import (
    _PACK_BUDGET,
    events_ohlc,
    heavy_hitter_terms,
    quality_percentile_gate,
    sequence_packing,
    time_weighted_avg,
)
from chillastic_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_sequence_packing_matches_local_replay(spark):
    docs = (
        load(spark, SF, "documents")
        .select("lang", "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .collect()
    )
    by_lang = {}
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        by_lang.setdefault(r["lang"], []).append(r["n"])
    got = {r["lang"]: r for r in sequence_packing(spark, SF).collect()}
    assert set(got) == set(by_lang)
    for lang, sizes in by_lang.items():
        total, off, spanning = sum(sizes), 0, 0
        for n in sizes:
            if off // _PACK_BUDGET != (off + n - 1) // _PACK_BUDGET:
                spanning += 1
            off += n
        row = got[lang]
        assert row["n_docs"] == len(sizes)
        assert row["total_tokens"] == total
        assert row["n_packs"] == (total - 1) // _PACK_BUDGET + 1
        assert row["n_spanning"] == spanning
        assert row["max_doc_tokens"] == max(sizes)


def test_quality_gate_keeps_top_fraction(spark):
    per_lang_total = {
        r["lang"]: r["n"]
        for r in load(spark, SF, "documents").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for row in quality_percentile_gate(spark, SF).collect():
        n = per_lang_total[row["lang"]]
        # percent_rank <= 0.3 keeps floor(0.3*(n-1)) + 1 rows
        expect = int(0.30 * (n - 1) + 1e-9) + 1
        assert row["n_kept"] == expect, (row["lang"], n)
        assert 0.0 <= row["q_threshold"] <= 1.0
        assert row["tokens_kept"] > 0


def test_time_weighted_avg_matches_numpy(spark):
    rows = (
        load(spark, SF, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    series = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault(r["event_type"], []).append((r["ts"], r["value"]))
    got = {r["event_type"]: r for r in time_weighted_avg(spark, SF).collect()}
    assert set(got) == set(series)
    for et, pts in series.items():
        ts = np.array([t.timestamp() for t, _ in pts])
        vs = np.array([v for _, v in pts])
        dt = np.diff(ts)
        want = float((vs[:-1] * dt).sum() / dt.sum())
        assert abs(got[et]["twa_value"] - want) < 1e-4, et
        assert got[et]["n_intervals"] == len(pts) - 1


def test_ohlc_matches_local_bruteforce(spark):
    rows = (
        load(spark, SF, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    groups = {}
    for r in rows:
        key = (r["event_type"], str(r["ts"].date()))
        groups.setdefault(key, []).append((r["ts"], r["event_id"], r["value"]))
    got = {(r["event_type"], r["day"]): r for r in events_ohlc(spark, SF).collect()}
    assert set(got) == set(groups)
    for key, pts in groups.items():
        pts.sort()
        row = got[key]
        assert row["open"] == pts[0][2] and row["close"] == pts[-1][2]
        assert row["high"] == max(p[2] for p in pts)
        assert row["low"] == min(p[2] for p in pts)
        assert row["n_events"] == len(pts)


def test_heavy_hitters_exact_when_capacity_exceeds_vocab(spark):
    """The corpus vocabulary fits in the 256-counter budget, so the
    sketch must return EXACT counts with a zero error bound."""
    d = load(spark, SF, "documents")
    exact = {
        r["token"]: r["n"]
        for r in d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(exact) <= 256
    got = heavy_hitter_terms(spark, SF).collect()
    assert len(got) == min(20, len(exact))
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    for row, (tok, n) in zip(got, top):
        assert (row["token"], row["est"]) == (tok, n)
        assert row["err_bound"] == 0


def test_heavy_hitters_bound_under_pressure(spark):
    """capacity << vocabulary: est must lower-bound the true count
    within err_bound, and every token with true > err_bound survives."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    weights = [1.0 / (i + 1) for i in range(200)]  # zipf-ish
    docs = [
        (i, " ".join(rng.choices(vocab, weights=weights, k=50))) for i in range(400)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(8)
    truth = {}
    for _, t in docs:
        for tok in t.split():
            truth[tok] = truth.get(tok, 0) + 1
    sk = heavy_hitter_tokens(df, capacity=16, k=200).collect()
    assert sk, "sketch returned nothing"
    err = sk[0]["err_bound"]
    assert err > 0  # pressure actually happened
    est = {r["token"]: r["est"] for r in sk}
    for tok, e in est.items():
        assert e <= truth[tok] <= e + err, tok
    survivors = set(est)
    for tok, n in truth.items():
        if n > err:
            assert tok in survivors, (tok, n, err)


def test_chunk_udtf_matches_expression_chunker(spark):
    """The SQL-facing UDTF must produce exactly the rows of the
    codegen chunker (non-empty docs; the expression path represents an
    empty doc as one empty chunk, the UDTF as zero rows)."""
    from chillastic_spark.operators.chunking import chunk_documents, chunk_text_udtf

    docs = load(spark, SF, "documents").limit(50)
    spark.udtf.register("chunk_text_t", chunk_text_udtf(50, 40))
    docs.createOrReplaceTempView("docs_t")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n"])
        for r in spark.sql(
            "SELECT doc_id, c.* FROM docs_t, LATERAL chunk_text_t(text) AS c"
        ).collect()
    }
    want = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(docs, size=50, stride=40).collect()
    }
    assert got == want
