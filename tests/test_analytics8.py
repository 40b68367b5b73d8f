"""Batch-16 tests: PII scrubbing completeness, DSIR target separation,
mixture-plan invariants, keep-best selection, incremental-dedup
consistency with the pairwise operator, and SemDeDup manifests."""
import re

import pyspark.sql.functions as F

from chillastic_spark.operators import dedup as D
from chillastic_spark.operators.components import duplicate_clusters
from chillastic_spark.operators.scrub import SCRUB_RULES
from chillastic_spark.queries.analytics8 import (
    _augmented_text,
    dedup_incremental,
    dedup_keep_best,
    dsir_importance_weights,
    domain_mixture_manifest,
    pii_scrub_report,
    semantic_dedup_manifest,
    _MIX_BUDGET,
)
from chillastic_spark.operators import text as T
from chillastic_spark.operators.scrub import scrub_text
from chillastic_spark.tables import load

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ PII


def test_scrub_removes_all_planted_pii(spark):
    d = load(spark, SF, "documents").select(
        "doc_id", _augmented_text().alias("aug")
    )
    s = d.select("doc_id", scrub_text("aug").alias("scrubbed")).collect()
    email = re.compile(SCRUB_RULES[1][1])
    digits = re.compile(r"\d{9,}")
    for r in s:
        assert "http://" not in r["scrubbed"] and "https://" not in r["scrubbed"]
        assert not email.search(r["scrubbed"]), r["doc_id"]
        assert not digits.search(r["scrubbed"]), r["doc_id"]
        assert "123-4567" not in r["scrubbed"]


def test_pii_report_counts_match_plants(spark):
    rep = pii_scrub_report(spark, SF).collect()
    ids = [r["doc_id"] for r in load(spark, SF, "documents").select("doc_id").collect()]
    # every planted rule fires on the docs it was planted into
    assert sum(r["hit_email"] for r in rep) == sum(1 for i in ids if i % 5 == 0)
    assert sum(r["hit_phone"] for r in rep) == sum(1 for i in ids if i % 7 == 0)
    assert sum(r["hit_url"] for r in rep) == sum(1 for i in ids if i % 13 == 0)
    assert sum(r["hit_long_digits"] for r in rep) == sum(1 for i in ids if i % 11 == 0)
    for r in rep:
        assert r["n_redacted"] <= r["n_docs"]
        assert r["chars_removed"] >= 0


# ----------------------------------------------------------------- DSIR


def test_dsir_weights_engine_exact_on_null_extras_and_dup_ids(spark):
    """r7 review finding: the old oracle's table rejoin was not
    NULL-safe on extra_cols — a NULL-lang doc's real weight vanished to
    (0, NULL) in SQL but not in Spark, and the sf corpora (no NULL
    lang) couldn't catch it. Both sides now build from the same token
    stream; pin value-exactness on the adversarial frame: NULL lang
    with real text, NULL text, whitespace text, and a duplicate
    (doc_id, lang) pair whose tokens must pool into one group."""
    import duckdb
    import pandas as pd

    from chillastic_spark.operators.importance import (
        dsir_weights,
        dsir_weights_sql,
    )

    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "der hund lief durch den wald", "de"),
        (3, "the dog sat on the log", None),  # NULL extra, real text
        (4, None, "en"),                       # NULL text
        (5, "   ", None),                      # ws-only text, NULL extra
        (6, "split doc first half", "en"),     # duplicate (doc_id, lang):
        (6, "split doc second half", "en"),    # tokens pool into one group
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r["doc_id"], r["lang"]): (r["n_tokens"], r["weight"])
        for r in dsir_weights(
            d, F.col("lang") == "en", buckets=64, extra_cols=["lang"]
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]),
    )
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.sql(
            dsir_weights_sql("lang = 'en'", buckets=64, extra_cols=["lang"])
        ).fetchall()
    }
    assert set(got) == set(want) == {
        (1, "en"), (2, "de"), (3, None), (4, "en"), (5, None), (6, "en"),
    }
    for k in want:
        assert got[k][0] == want[k][0], (k, got[k], want[k])
        if want[k][1] is None:
            assert got[k][1] is None, k
        else:
            assert abs(got[k][1] - want[k][1]) < 1e-12, (k, got[k], want[k])
    # the NULL-lang doc with real text keeps its real weight (the old
    # rejoin zeroed it), token-less docs read (0, NULL), and the
    # duplicate id pooled BOTH rows' tokens into one group
    assert got[(3, None)][0] == 6 and got[(3, None)][1] is not None
    assert got[(4, "en")] == (0, None) and got[(5, None)] == (0, None)
    assert got[(6, "en")][0] == 8


def test_dsir_separates_target_domain(spark):
    """English docs must score strictly higher on average (per token)
    than every other language under an English-target DSIR weighting —
    the operator's entire point. The synthetic corpus shares one
    vocabulary across langs (only stopword rates differ), so the gap
    is small but must be consistently positive."""
    d = load(spark, SF, "documents")
    from chillastic_spark.operators.importance import dsir_weights

    w = dsir_weights(d, F.col("lang") == "en", extra_cols=["lang"]).collect()
    per = {}
    for r in w:
        per.setdefault(r["lang"], []).append(r["weight"] / r["n_tokens"])
    means = {lang: sum(v) / len(v) for lang, v in per.items()}
    assert all(means["en"] > m for lang, m in means.items() if lang != "en")


def test_dsir_topk_enriches_english(spark):
    d = load(spark, SF, "documents")
    base = d.filter(F.col("lang") == "en").count() / d.count()
    top = dsir_importance_weights(spark, SF).collect()
    assert len(top) == 50
    en_frac = sum(1 for r in top if r["lang"] == "en") / len(top)
    assert en_frac > base + 0.1  # meaningfully enriched over the pool
    # ordered by normalized score desc, doc_id asc
    keys = [(-r["score"], r["doc_id"]) for r in top]
    assert keys == sorted(keys)


# -------------------------------------------------------------- mixture


def test_mixture_manifest_invariants(spark):
    rows = domain_mixture_manifest(spark, SF).collect()
    assert {r["mix_weight"] for r in rows} <= {1, 2, 3, 4}
    for r in rows:
        assert 0.0 <= r["sample_rate"] <= 1.0
        assert r["expected_tokens"] <= r["actual_tokens"]
        # rate < 1 ⇒ the plan is token-budget-limited for this source
        if r["sample_rate"] < 1.0:
            assert abs(r["expected_tokens"] - r["desired_tokens"]) <= max(
                1, r["desired_tokens"] * 0.001
            )
    # desired allocations can't exceed the budget
    assert sum(r["desired_tokens"] for r in rows) <= _MIX_BUDGET


# ------------------------------------------------------------ keep-best


def test_keep_best_picks_max_quality_member(spark):
    d = load(spark, SF, "documents")
    pairs = D.ngram_jaccard_pairs(d, n=3, threshold=0.5)
    clusters = {
        r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()
    }
    quality = {
        r["doc_id"]: r["quality"]
        for r in T.with_text_features(d).select("doc_id", "quality").collect()
    }
    got = {r["cluster_id"]: r for r in dedup_keep_best(spark, SF).collect()}
    # every cluster reported once with its true member count
    from collections import Counter

    sizes = Counter(clusters.values())
    assert set(got) == set(sizes)
    for cid, row in got.items():
        assert row["n_members"] == sizes[cid] >= 2
        members = [doc for doc, c in clusters.items() if c == cid]
        best = min(members, key=lambda doc: (-quality[doc], doc))
        assert row["keep_id"] == best
        assert row["keep_quality"] == quality[best]


# ---------------------------------------------------------- incremental


def test_incremental_matches_pairwise_operator(spark):
    """The incremental flags must be exactly the cross-batch projection
    of the full pairwise LSH operator (same signatures, same bands)."""
    d = load(spark, SF, "documents")
    pairs = D.minhash_lsh_pairs(d, n=3, num_perm=16, bands=4, threshold=0.25).collect()
    inc = lambda i: i % 3 == 0  # noqa: E731
    best = {}
    for r in pairs:
        for a, b in ((r["id_a"], r["id_b"]), (r["id_b"], r["id_a"])):
            if inc(a) and not inc(b):
                cur = best.get(a)
                cand = (-r["est_jaccard"], b)
                if cur is None or cand < cur:
                    best[a] = cand
    got = {r["doc_id"]: (-r["est_jaccard"], r["match_id"])
           for r in dedup_incremental(spark, SF).collect()}
    assert got == best
    for doc, (_, match) in got.items():
        assert inc(doc) and not inc(match)


# -------------------------------------------------------------- semdedup


def test_semantic_dedup_manifest_clusters(spark):
    rows = semantic_dedup_manifest(spark, SF).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        kept = [m for m in members if m["is_kept"]]
        assert len(kept) == 1
        assert kept[0]["vec_id"] == cid == min(m["vec_id"] for m in members)
        assert len(members) >= 2


# ------------------------------------------------------ BPE merge pairs


def test_bpe_merge_candidates_match_local_count(spark):
    from collections import Counter

    texts = [r["text"] for r in load(spark, SF, "documents").select("text").collect()]
    want = Counter()
    for t in texts:
        for w in t.strip().split():
            for i in range(len(w) - 1):
                want[w[i : i + 2]] += 1
    from chillastic_spark.queries.analytics8 import bpe_merge_candidates

    got = bpe_merge_candidates(spark, SF).collect()
    assert len(got) == 30
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert [(r["pair"], r["n"]) for r in got] == expect


# ------------------------------------------------------ embedding outliers


def test_embedding_outliers_flags_bottom_decile(spark):
    import numpy as np

    from chillastic_spark.queries.vectors import embedding_outliers

    rows = load(spark, SF, "embeddings").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        )
    flagged = embedding_outliers(spark, SF).collect()
    got = {(r["vec_id"], r["label"]) for r in flagged}
    for label, members in by_label.items():
        cent = np.mean([v for _, v in members], axis=0)
        cent = np.floor(cent * 1e6 + 0.5) / 1e6
        cos = {
            vid: float(
                np.floor(
                    (v @ cent / (np.linalg.norm(v) * np.linalg.norm(cent))) * 1e6 + 0.5
                )
                / 1e6
            )
            for vid, v in members
        }
        cut = float(np.percentile(sorted(cos.values()), 10, method="linear"))
        want = {vid for vid, c in cos.items() if c < np.floor(cut * 1e6 + 0.5) / 1e6}
        assert {vid for vid, lb in got if lb == label} == want, label
        # roughly a decile per label
        assert len(want) <= max(2, 0.15 * len(members))


# ------------------------------------------------- streaming incremental


def test_incremental_dedup_stream_matches_batch(spark, tmp_path):
    """The streaming flags (micro-batched incoming docs vs the static
    corpus) must equal the batch dedup_incremental output — per-doc
    flags depend only on the doc and the static side, so batching
    boundaries cannot change them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chillastic_spark.streaming import incremental_dedup_stream

    d = load(spark, SF, "documents")
    existing = d.filter(F.col("doc_id") % 3 != 0)
    incoming = d.filter(F.col("doc_id") % 3 == 0).toPandas()

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    n_files = 4
    step = max(1, len(incoming) // n_files)
    for i in range(n_files):
        chunk = (
            incoming.iloc[i * step :]
            if i == n_files - 1
            else incoming.iloc[i * step : (i + 1) * step]
        )
        if len(chunk):
            pq.write_table(
                pa.Table.from_pandas(chunk, preserve_index=False),
                str(stream_dir / f"part-{i:04d}.parquet"),
            )

    out_dir = str(tmp_path / "flags")
    q = incremental_dedup_stream(
        spark,
        str(stream_dir),
        existing,
        out_dir,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        (r["doc_id"], r["match_id"], r["est_jaccard"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["doc_id"], r["match_id"], r["est_jaccard"])
        for r in dedup_incremental(spark, SF).collect()
    }
    assert got == want and len(want) > 0


# --------------------------------------------- semantic decontamination


def test_semantic_decontaminate_matches_numpy(spark):
    import hashlib

    import numpy as np

    from chillastic_spark.queries.vectors import (
        _SEM_TAU,
        semantic_decontaminate_flags,
    )

    rows = load(spark, SF, "embeddings").collect()

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    bench, corpus = [], []
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        (bench if h60(f"{r['vec_id']}#vbench") % 100 < 5 else corpus).append(
            (r["vec_id"], v)
        )
    assert bench, "hash gate selected no benchmark vectors"
    want = {}
    for vid, v in corpus:
        hits = []
        for _, bv in bench:
            c = float(v @ bv / (np.linalg.norm(v) * np.linalg.norm(bv)))
            c = np.floor(c * 1e6 + 0.5) / 1e6
            if c >= _SEM_TAU:
                hits.append(c)
        if hits:
            want[vid] = (len(hits), max(hits))
    got = {
        r["vec_id"]: (r["n_hits"], r["max_cos"])
        for r in semantic_decontaminate_flags(spark, SF).collect()
    }
    assert got == want and len(want) > 0


def test_dsir_weights_preserve_null_and_empty_text_docs(spark):
    """Review finding: NULL-text docs had NO weights row, so a
    resampling step keyed on this table silently excluded them. They
    now carry (n_tokens=0, weight NULL) explicitly."""
    from chillastic_spark.operators.importance import dsir_weights

    d = spark.createDataFrame(
        [(1, "the cat sat", "en"), (2, None, "de"), (3, "  ", "fr")],
        "doc_id long, text string, lang string",
    )
    rows = {
        r["doc_id"]: r
        for r in dsir_weights(d, F.col("lang") == "en", extra_cols=["lang"]).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_tokens"] == 3 and rows[1]["weight"] is not None
    for doc in (2, 3):
        assert rows[doc]["n_tokens"] == 0 and rows[doc]["weight"] is None
        assert rows[doc]["lang"] in ("de", "fr")
