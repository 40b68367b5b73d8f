"""Search-query tests: conjunctive match correctness and BM25 vs a
local reference scorer."""
import math

from chillastic_spark.queries.search import (
    B,
    K1,
    TERMS,
    TOP_K,
    bm25_topk,
    keyword_search_and,
)
from chillastic_spark.tables import load

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    return {
        r["doc_id"]: r["text"].strip().split()
        for r in load(spark, SF, "documents").collect()
    }


def test_keyword_and_requires_all_terms(spark):
    corpus = _corpus(spark)
    got = {r["doc_id"]: r["total_hits"] for r in keyword_search_and(spark, SF).collect()}
    want = {}
    for doc_id, toks in corpus.items():
        hits = [t for t in toks if t in TERMS]
        if all(t in hits for t in TERMS):
            want[doc_id] = len(hits)
    assert got == want


def test_bm25_matches_local_reference(spark):
    corpus = _corpus(spark)
    n_docs = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n_docs
    df = {
        t: sum(1 for toks in corpus.values() if t in toks) for t in TERMS
    }
    scores = {}
    for doc_id, toks in corpus.items():
        s = 0.0
        for t in TERMS:
            tf = toks.count(t)
            if not tf:
                continue
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            s += round(
                idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * len(toks) / avgdl)),
                9,
            )
        if s > 0:
            scores[doc_id] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
    got = bm25_topk(spark, SF).collect()
    assert len(got) == len(want)
    for row, (doc_id, score) in zip(got, want):
        assert row["doc_id"] == doc_id
        assert abs(row["bm25"] - score) < 1e-5, doc_id


def test_hybrid_rrf_fuses_both_modalities(spark):
    """RRF output must contain docs reachable only via text rank and
    only via vector rank, and every fused score must equal
    1/(60+rt) + 1/(60+rv) of its observed ranks."""
    from chillastic_spark.queries.search import RRF_K, hybrid_search_rrf

    rows = hybrid_search_rrf(spark, SF).collect()
    assert rows
    assert any(r["text_rank"] is not None and r["vec_rank"] is None for r in rows)
    assert any(r["vec_rank"] is not None and r["text_rank"] is None for r in rows)
    for r in rows:
        want = (1.0 / (RRF_K + r["text_rank"]) if r["text_rank"] else 0.0) + (
            1.0 / (RRF_K + r["vec_rank"]) if r["vec_rank"] else 0.0
        )
        assert abs(r["rrf"] - want) < 1e-8
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_search_after_is_exact_continuation(spark):
    """Page 2 (keyset) must be exactly ranks 21-40 of the full
    ranking, with no overlap against page 1."""
    from chillastic_spark.queries.search import bm25_scored
    from chillastic_spark.queries.search2 import PAGE_SIZE, search_after_page

    full = sorted(
        [(r["doc_id"], r["bm25"]) for r in bm25_scored(spark, SF).collect()],
        key=lambda t: (-t[1], t[0]),
    )
    want = [d for d, _ in full[PAGE_SIZE : 2 * PAGE_SIZE]]
    got = [r["doc_id"] for r in search_after_page(spark, SF).collect()]
    assert got == want
    page1 = {d for d, _ in full[:PAGE_SIZE]}
    assert not (set(got) & page1)


def test_snippets_center_on_first_hit(spark):
    from chillastic_spark.queries.search2 import (
        SNIPPET_RADIUS,
        SNIPPET_TERM,
        search_snippets,
    )

    corpus = _corpus(spark)
    rows = search_snippets(spark, SF).collect()
    seen = {r["doc_id"] for r in rows}
    expect = {d for d, toks in corpus.items() if SNIPPET_TERM in toks}
    assert seen == expect
    for r in rows[:50]:
        toks = corpus[r["doc_id"]]
        pos = toks.index(SNIPPET_TERM)  # 0-based
        assert r["pos"] == pos + 1
        start = max(pos - SNIPPET_RADIUS, 0)
        assert r["snippet"] == " ".join(toks[start : start + 2 * SNIPPET_RADIUS + 1])
        assert SNIPPET_TERM in r["snippet"].split()


def test_fuzzy_matches_are_within_edit_distance(spark):
    from chillastic_spark.queries.search2 import (
        FUZZY_MAX_EDITS,
        FUZZY_QUERY,
        fuzzy_search,
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    rows = fuzzy_search(spark, SF).collect()
    assert rows
    for r in rows[:50]:
        for t in r["matched_terms"].split(","):
            assert lev(t, FUZZY_QUERY) <= FUZZY_MAX_EDITS, t


def test_percolate_matches_local_replay(spark):
    from chillastic_spark.queries.search2 import STORED_QUERIES, percolate

    corpus = _corpus(spark)
    want = {}
    for qid, terms in STORED_QUERIES.items():
        matches = [d for d, toks in corpus.items() if all(t in toks for t in terms)]
        want[qid] = (len(matches), min(matches) if matches else None)
    got = {
        r["qid"]: (r["n_docs"], r["first_doc"]) for r in percolate(spark, SF).collect()
    }
    assert got == want
    assert got["alerts_none"] == (0, None)


def test_rank_eval_matches_local_metrics(spark):
    import math

    from chillastic_spark.queries.search import bm25_scored
    from chillastic_spark.queries.search2 import _EVAL_K, search_rank_eval

    full = sorted(
        [(r["doc_id"], r["bm25"]) for r in bm25_scored(spark, SF).collect()],
        key=lambda t: (-t[1], t[0]),
    )
    topk = [d for d, _ in full[:_EVAL_K]]
    corpus = _corpus(spark)
    rel = {d for d, toks in corpus.items() if all(t in toks for t in TERMS)}
    hits = [i + 1 for i, d in enumerate(topk) if d in rel]
    p_at_k = len(hits) / _EVAL_K
    mrr = 1.0 / hits[0] if hits else 0.0
    dcg = sum(round(1.0 / math.log2(r + 1), 9) for r in hits)
    idcg = sum(
        round(1.0 / math.log2(i + 1), 9) for i in range(1, min(len(rel), _EVAL_K) + 1)
    )
    row = search_rank_eval(spark, SF).collect()[0]
    assert row["n_rel"] == len(rel)
    assert abs(row["p_at_k"] - p_at_k) < 1e-6
    assert abs(row["mrr"] - mrr) < 1e-6
    assert abs(row["ndcg_at_k"] - dcg / idcg) < 1e-6


def test_phrase_prefilter_is_lossless(spark):
    """The r10 rlike pre-filter must never drop a row the exact
    counter would keep: every doc whose tokens contain the adjacent
    phrase must pass the raw-text regex — adversarial shapes included
    (phrase at text boundaries, every words() whitespace kind between
    the tokens, multi-space runs). Near-miss shapes ("tables scan",
    reversed order) may pass the regex but must be rejected by the
    exact counter, so the composed result is unchanged."""
    from pyspark.sql import functions as F

    from chillastic_spark import functions as CF
    from chillastic_spark.queries.search import (
        PHRASE,
        phrase_hits,
        phrase_prefilter_rx,
    )

    t1, t2 = PHRASE
    docs = [
        (1, f"{t1} {t2} starts the text"),          # boundary start
        (2, f"text ends with {t1} {t2}"),            # boundary end
        (3, f"a {t1}\t{t2} tab"),                    # tab between
        (4, f"a {t1}\n{t2} newline"),                # newline between
        (5, f"a {t1}\x0b{t2} vtab"),                 # vertical tab
        (6, f"a {t1}\f{t2} formfeed"),               # form feed
        (7, f"a {t1}\r{t2} carriage"),               # carriage return
        (8, f"a {t1}   {t2} multirun"),              # whitespace run
        (9, f"{t1} {t2}"),                           # exactly the phrase
        (10, f"pre{t1} {t2} glued-prefix"),          # regex FP, token miss
        (11, f"a {t1}s {t2} plural"),                # near-miss token
        (12, f"a {t2} {t1} reversed"),               # wrong order
        (13, "no phrase at all"),
        (14, f"a {t1} x {t2} separated"),            # gap between tokens
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = df.select("doc_id", CF.words("text").alias("w"))
    exact = {
        r["doc_id"]
        for r in toks.select(
            "doc_id", phrase_hits("w", *PHRASE).alias("n")
        ).filter(F.col("n") > 0).collect()
    }
    passed = {
        r["doc_id"]
        for r in df.filter(
            F.col("text").rlike(phrase_prefilter_rx(*PHRASE))
        ).collect()
    }
    assert exact == {1, 2, 3, 4, 5, 6, 7, 8, 9}
    # losslessness: every exact hit passes the pre-filter
    assert exact <= passed
    # the composed query shape = prefilter then exact: same set
    composed = {
        r["doc_id"]
        for r in df.filter(F.col("text").rlike(phrase_prefilter_rx(*PHRASE)))
        .select("doc_id", phrase_hits(CF.words("text"), *PHRASE).alias("n"))
        .filter(F.col("n") > 0)
        .collect()
    }
    assert composed == exact
