"""Randomized engine-exactness sweep for the tokenization stack.

The fixed edge cases in test_review_fixes_r6b pin known divergence
traps (space-only trim, RE2's \\x0B gap); this sweep drives the SAME
three definitions — Spark expression, DuckDB oracle SQL, and the
pure-Python twin — over hundreds of adversarial random strings heavy
in whitespace control characters, so any future drift between the
engines' regex dialects fails loudly. Seeded: failures reproduce.
"""
import random
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from chillastic_spark import functions as CF

_ALPHABET = (
    list("ab zZ09.'-")
    + ["\t", "\n", "\x0b", "\f", "\r", " ", "  ", "\r\n", "''", "e't"]
)


def _corpus(n=300, seed=1234):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(0, 12)
        out.append("".join(rng.choice(_ALPHABET) for _ in range(k)))
    # make sure the nasty shapes are always present
    out += ["", " ", "\x0b", "a\x0bb", "x\r\n", "\t\f", "word"]
    return out


_WS = " \t\n\x0b\f\r"


def _py_words(t):
    """The chunk_text_udtf tokenizer — Java-\\s-exact by construction."""
    return re.split(f"[{_WS}]+", t.strip(_WS))


def test_words_three_way_exact(spark):
    texts = _corpus()
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.w for r in df.select(CF.words("text").alias("w")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {CF.words_sql('text')} FROM t ORDER BY i"
        ).fetchall()
    ]
    for t, s_w, d_w in zip(texts, got, duck):
        assert s_w == d_w, (repr(t), s_w, d_w)
        assert s_w == _py_words(t), (repr(t), s_w, _py_words(t))


def test_fingerprint_two_way_exact(spark):
    texts = _corpus(seed=99)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.f for r in df.select(CF.fingerprint("text").alias("f")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {CF.fingerprint_sql('text')} FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got == duck


def test_bpe_pretokenizer_two_way_exact(spark):
    from chillastic_spark.operators.text import BPE_PATTERN
    from chillastic_spark.queries.analytics3 import _BPE_PAT_SQL

    texts = _corpus(seed=7)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r.n
        for r in df.select(
            F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0))).alias("n")
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT len(regexp_extract_all(text, '{_BPE_PAT_SQL}')) FROM t ORDER BY i"
        ).fetchall()
    ]
    for t, s_n, d_n in zip(texts, got, duck):
        assert s_n == d_n, repr(t)
