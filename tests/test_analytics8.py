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
