"""Regression tests for the round-7 dedup/similarity review sweep:
dirty-row handling in the ANN paths, NULL-safe centroid outliers,
simhash's empty-doc contract, and the exact_dedup reserved-column
guard."""
import pytest
from pyspark.sql import functions as F

from chillastic_spark.operators import dedup as D
from chillastic_spark.operators import similarity as S


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], "a"),
        (1, [0.9, 0.1, 0.0], "a"),
        (2, [0.0, 1.0, 0.0], "a"),
        (3, [0.0, 0.9, 0.1], "b"),
        (4, [0.1, 0.0, 1.0], "b"),
        (None, [1.0, 0.0, 0.0], "a"),   # NULL id
        (6, None, "a"),                  # NULL vector
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )


def test_brute_force_twins_agree_on_dirty_rows(spark):
    """NULL-id corpus rows crashed the fast path's Arrow long cast (or
    emitted phantom NULL neighbors); NULL-embedding rows padded the
    slow path's top-k with NULL-cos junk. Both twins must drop them
    and agree row-for-row."""
    v = _vecs(spark)
    q = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0])], "query_id long, embedding array<double>"
    )
    slow = {(r["query_id"], r["neighbor_id"], r["cos"])
            for r in S.brute_force_topk(v, q, k=10).collect()}
    fast = {(r["query_id"], r["neighbor_id"], r["cos"])
            for r in S.brute_force_topk_fast(v, q, k=10).collect()}
    assert slow == fast
    ids = {n for _, n, _ in slow}
    assert None not in ids and 6 not in ids  # dirty rows dropped
    assert ids == {1, 2, 3, 4}  # every clean non-query row scored


def test_centroid_outliers_includes_null_label_group_and_drops_poison(spark):
    """NULL labels form their own group (null-safe joins) instead of
    being silently exempted; arrays CONTAINING a NULL element are
    excluded up front instead of biasing the group cutoff."""
    import random

    random.seed(7)
    rows = []
    for lab in ("a", None):
        for i in range(12):
            base = [1.0, 0.0] if lab == "a" else [0.0, 1.0]
            rows.append((
                (0 if lab == "a" else 100) + i,
                [base[0] + random.uniform(-0.05, 0.05),
                 base[1] + random.uniform(-0.05, 0.05)],
                lab,
            ))
    # one far outlier per group + one NULL-element poison row
    rows.append((50, [-1.0, 0.0], "a"))
    rows.append((150, [0.0, -1.0], None))
    rows.append((60, [0.5, None], "a"))
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = {r["vec_id"]: r for r in S.centroid_outliers(d, pct=0.1).collect()}
    assert 50 in out and out[50]["label"] == "a"
    assert 150 in out and out[150]["label"] is None  # NULL group scored
    assert 60 not in out  # poison row excluded, not silently unflaggable
    # and the poison row did not bias group a's cutoff to NULL/zero
    assert out[50]["cutoff"] is not None


def test_simhash_empty_docs_read_zero_and_never_pair(spark):
    """Empty/whitespace/NULL-text docs keep an id-complete simhash row
    of 0 (the '' phantom token used to give them ALL one identical
    non-zero fingerprint), and pair generation excludes them — n blank
    docs used to emit O(n^2) identical-hash pairs."""
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, ""),
        (4, "   "),
        (5, None),
        (6, "totally different words entirely here now"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(d).collect()}
    assert set(sh) == {1, 2, 3, 4, 5, 6}  # id-complete
    assert sh[3] == sh[4] == sh[5] == 0
    assert sh[1] == sh[2] != 0
    pairs = {(r["id_a"], r["id_b"]) for r in D.simhash_pairs(d).collect()}
    assert (1, 2) in pairs
    # no pair touches a token-less doc
    assert all(a not in (3, 4, 5) and b not in (3, 4, 5) for a, b in pairs)


def test_exact_dedup_rejects_reserved_rn_column(spark):
    d = spark.createDataFrame(
        [(1, "x", 9)], "doc_id long, text string, __rn int"
    )
    with pytest.raises(ValueError, match="__rn"):
        D.exact_dedup(d)


def test_chunking_drops_token_less_docs_across_all_surfaces(spark):
    """NULL-text docs used to emit a phantom chunk with n_chunk_tokens
    = size (inflating token accounting by `size` per NULL doc) and
    empty docs counted their '' phantom token; token-less docs now
    emit NO chunks on the expression path, the UDTF, and the oracle."""
    from chillastic_spark.operators.chunking import (
        chunk_documents,
        chunk_text_udtf,
    )

    rows = [(1, "one two three four five"), (2, None), (3, ""), (4, "   ")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = chunk_documents(d, size=3, stride=2).collect()
    assert {r["doc_id"] for r in got} == {1}
    assert sum(r["n_chunk_tokens"] for r in got) >= 5  # overlap counts twice
    assert all(r["n_chunk_tokens"] > 0 for r in got)

    spark.udtf.register("chunk_text_r7d", chunk_text_udtf(3, 2))
    d.createOrReplaceTempView("docs_r7d")
    u = spark.sql(
        "SELECT doc_id, c.* FROM docs_r7d, LATERAL chunk_text_r7d(text) c"
    ).collect()
    assert {r["doc_id"] for r in u} == {1}
    assert {(r["doc_id"], r["chunk_idx"], r["chunk_text"]) for r in u} == {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"]) for r in got
    }


def test_whole_request_http_429_is_retried_with_backoff(spark):
    """Real ES under write pressure 429s the ENTIRE _bulk request at
    the HTTP layer; that used to bypass the retry loop entirely and
    kill the task on one transient rejection."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from es_fixture import FakeES

    from chillastic_spark.sources import es_rest

    es = FakeES(reject_first_bulks_http=2)
    url = es.start()
    try:
        lines = []
        for i in range(3):
            lines.extend(es_rest.doc_to_bulk(
                {"_index": "ix", "_type": "t", "_id": f"d{i}",
                 "_source": {"v": i}}
            ))
        n = es_rest._send_bulk(es_rest.as_wire(url), lines, 3)
        assert n == 3
        assert len(es.contents("ix")) == 3
        assert len(es.bulk_bodies) == 3  # 2 rejected + 1 delivered

        # delete path shares the same backpressure discipline
        es.reject_http_remaining = 1
        deleted = es_rest.bulk_delete(url, "ix", [("t", "d0"), ("t", "d1")])
        assert deleted == 2
        assert len(es.contents("ix")) == 1

        # and a PERMANENT 429 storm still surfaces after max_retries
        es.reject_http_remaining = 99
        with pytest.raises(RuntimeError, match="HTTP 429"):
            es_rest._send_bulk(
                es_rest.as_wire(url), lines[:2], 1,
                max_retries=2, backoff_sec=0.001,
            )
    finally:
        es.stop()


def test_scan_reads_size_from_docvalue_fields_shape(spark):
    """Real clusters serve mapper-size under hits[].fields._size only
    when asked; the fixture now mirrors that, so this pins BOTH the
    ask and the parse — an engine that forgets either reads NULL sizes
    and size-bucket planning degenerates."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from es_fixture import FakeES

    from chillastic_spark.sources.es_rest import ESStore

    es = FakeES()
    url = es.start()
    try:
        es.seed("ix", "t1", {f"d{i}": {"v": i, "__size": 40 + i} for i in range(6)})
        store = ESStore(url, slices=1)
        sizes = [
            r["_size"]
            for r in store.read_sizes(spark, "ix", "t1").collect()
        ]
        assert sorted(sizes) == [40, 41, 42, 43, 44, 45]
        # the full read carries sizes into the envelope too
        env = {r["_id"]: r["_size"] for r in store.read(spark, "ix", "t1").collect()}
        assert env["d3"] == 43
    finally:
        es.stop()


def test_scrub_phone_precision_on_non_pii_numerics(spark):
    """The old phone rule accepted '.'/'-' runs alone as separators and
    redacted decimals, IPs, and date pairs — the over-redaction the
    module's high-precision contract forbids. Classic phone shapes
    still scrub; math/networking/date content survives."""
    from chillastic_spark.operators.scrub import scrub_text

    rows = [
        (1, "pi is 3.14159265 exactly"),
        (2, "host 192.168.100.250 up"),
        (3, "range 2024-01-15 2024-01-16 ok"),
        (4, "call +1 (555) 123-4567 now"),
        (5, "or 555-123-4567 works"),
        (6, "raw 5551234567 too"),
        (7, "account 1234567890123 big"),  # 13 digits -> <NUM>, not a
    ]                                      # partial <PHONE>
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["s"] for r in d.select(
        "doc_id", scrub_text("text").alias("s")).collect()}
    assert got[1] == "pi is 3.14159265 exactly"
    assert got[2] == "host 192.168.100.250 up"
    assert got[3] == "range 2024-01-15 2024-01-16 ok"
    assert got[4] == "call <PHONE> now"
    assert got[5] == "or <PHONE> works"
    assert got[6] == "raw <PHONE> too"
    assert got[7] == "account <NUM> big"


def test_scrub_rules_are_re2_compatible_and_engine_exact(spark):
    """Every rule pattern must run identically on Java (Spark) and RE2
    (DuckDB) — including the \\x0b whitespace divergence the repo-wide
    explicit-char-class rule exists for."""
    import duckdb
    import pandas as pd

    from chillastic_spark.operators.scrub import SCRUB_RULES, scrub_text

    rows = [
        (1, "see https://a.b/c\x0btail x"),       # \x0b ends the URL both sides
        (2, "mail a.b@c.de\x0bnext"),
        (3, "call 555-123-4567\x0bok"),
        (4, "id 123456789\x0bafter"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["s"] for r in d.select(
        "doc_id", scrub_text("text").alias("s")).collect()}
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    expr = "text"
    for _, pattern, repl in SCRUB_RULES:
        p = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    want = {r[0]: r[1] for r in con.sql(
        f"SELECT doc_id, {expr} FROM t").fetchall()}
    assert got == want


def test_asof_tiebreak_column_does_not_leak_and_collisions_raise(spark):
    from chillastic_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 9, 5, 1.5), (1, 9, 7, 2.5)], "k long, t long, seq long, price double"
    )
    out = asof_join(left, right, key="k", ts="t", value_cols=["price"],
                    order_tiebreak="seq")
    assert out.columns == ["k", "t", "price"]  # no all-NULL seq column
    assert out.collect()[0]["price"] == 2.5  # largest tiebreak wins

    left2 = spark.createDataFrame([(1, 10, 999.0)], "k long, t long, price double")
    import pytest as _pt
    with _pt.raises(ValueError, match="collide with"):
        asof_join(left2, right, key="k", ts="t", value_cols=["price"])


def test_salted_join_handles_map_columns(spark):
    from chillastic_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(1, {"a": "x"}), (1, {"b": "y"}), (2, None)],
        "k long, props map<string,string>",
    )
    small = spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string")
    got = salted_join(big, small, "k", salt_buckets=4).collect()
    assert len(got) == 3
    assert {r["name"] for r in got} == {"one", "two"}


def test_bpe_encoder_twin_holds_on_empty_word(spark):
    from chillastic_spark.operators.bpe import EOW, encode_local, encode_words

    d = spark.createDataFrame([("",), ("ab",)], "word string")
    got = {r["word"]: r["bpe"] for r in encode_words(d, [("a", "b")]).collect()}
    assert got[""] == encode_local("", [("a", "b")]) == [EOW]
    assert got["ab"] == encode_local("ab", [("a", "b")])


def test_heavy_hitter_capacity_validated(spark):
    from chillastic_spark.operators.sketches import heavy_hitter_tokens
    from chillastic_spark.tables import load

    d = load(spark, SF := "/root/testdata/sf0.001", "documents").limit(5)
    for bad in (0, -1):
        with pytest.raises(ValueError, match="capacity"):
            heavy_hitter_tokens(d, capacity=bad)


def test_iterative_operators_release_setup_pins(spark):
    """pagerank leaked nodes/deg/out/dangling per call, train_bpe its
    final vocab checkpoint, label_propagation its undirected edges —
    callers run outside any batch_scope, so session-lifetime leaks."""
    from chillastic_spark.operators.bpe import train_bpe, word_frequencies
    from chillastic_spark.operators.graph import label_propagation, pagerank
    from chillastic_spark.tables import load

    sc = spark.sparkContext

    def n_pins():
        import time
        for _ in range(20):
            s = sc._jsc.sc().getPersistentRDDs().keySet().toString()
            ids = {x.strip(",()") for x in s.removeprefix("Set(").split() if x.strip(",()")}
            if len(ids - baseline) <= expected[0]:
                return len(ids - baseline)
            time.sleep(0.25)
        return len(ids - baseline)

    s0 = sc._jsc.sc().getPersistentRDDs().keySet().toString()
    baseline = {x.strip(",()") for x in s0.removeprefix("Set(").split() if x.strip(",()")}

    edges = spark.createDataFrame(
        [(i, (i + 1) % 20) for i in range(20)] + [(5, 7), (7, 9)],
        "src long, dst long",
    )
    ranks = pagerank(edges, iters=3)
    ranks.count()
    expected = [1]  # only the returned ranks checkpoint may remain
    assert n_pins() <= 1

    labels = label_propagation(edges, iters=2)
    labels.count()
    expected = [2]
    assert n_pins() <= 2

    d = load(spark, "/root/testdata/sf0.001", "documents").limit(40)
    train_bpe(d, n_merges=3)
    expected = [2]  # train_bpe adds NOTHING that survives
    assert n_pins() <= 2

    from chillastic_spark.persist import release
    release(ranks)
    release(labels)


def test_vector_oracles_engine_exact_on_dirty_rows(spark):
    """r7: the Spark ANN/outlier operators were hardened against dirty
    rows but their DuckDB twins were not — the clean fixture masked the
    divergence. Pin value-parity on a frame with NULL embeddings, NULL
    labels, and NULL-element vectors."""
    import duckdb
    import pandas as pd

    from chillastic_spark.operators import similarity as S
    from chillastic_spark.queries.vectors import (
        SIMILARITY_TOPK_SQL,
        _outliers_sql,
    )

    import random
    random.seed(3)
    rows = []
    for i in range(20):
        lab = ["a", "b", None][i % 3]
        base = {"a": [1.0, 0.0], "b": [0.0, 1.0], None: [0.7, 0.7]}[lab]
        rows.append((i, [base[0] + random.uniform(-0.05, 0.05),
                         base[1] + random.uniform(-0.05, 0.05)], lab))
    rows.append((50, None, "a"))          # NULL embedding
    rows.append((51, [0.5, None], "b"))   # NULL element
    rows.append((52, [-1.0, 0.0], "a"))   # far outlier
    rows.append((53, [-0.7, -0.7], None))  # far outlier, NULL label
    d = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        rows, columns=["vec_id", "embedding", "label"]))

    q = d.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = {(r["query_id"], r["neighbor_id"], r["cos"])
           for r in S.brute_force_topk(d, q, k=10).collect()}
    want = {tuple(r) for r in con.sql(SIMILARITY_TOPK_SQL).fetchall()}
    assert got == want
    assert all(n != 50 for _, n, _ in got)  # NULL embedding absent

    got_o = {(r["vec_id"], r["label"]) for r in
             S.centroid_outliers(d, pct=0.2).collect()}
    want_o = {(r[0], r[1]) for r in con.sql(_outliers_sql(0.2)).fetchall()}
    assert got_o == want_o
    assert (52, "a") in got_o and (53, None) in got_o  # NULL group scored
    assert all(v != 51 for v, _ in got_o)  # poison row excluded


def test_event_transitions_engine_exact_on_null_ts(spark):
    """Spark asc = NULLS FIRST, DuckDB default = NULLS LAST: one
    NULL-ts event used to produce different (prev, next) pairs per
    engine; the oracle now pins NULLS FIRST."""
    import datetime

    import duckdb
    import pandas as pd

    from chillastic_spark.queries import analytics4 as A4

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(4):
        for j in range(4):
            eid += 1
            ts = None if (u == 1 and j == 2) else t0 + datetime.timedelta(
                minutes=10 * j + u)
            rows.append((eid, ts, u, ["view", "click", "buy"][j % 3], 1.0, "{}"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = spark.createDataFrame(pdf)
    import unittest.mock as um
    with um.patch.object(A4, "load", lambda s, sf, n: d):
        got = {(r["prev_type"], r["next_type"], r["n"], r["p"])
               for r in A4.event_transitions(spark, "unused").collect()}
    con = duckdb.connect()
    con.register("events", pdf)
    want = {tuple(r) for r in con.sql(A4.EVENT_TRANSITIONS_SQL).fetchall()}
    assert got == want and len(got) > 0
