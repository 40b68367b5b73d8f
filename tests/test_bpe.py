"""Distributed BPE training (operators/bpe.py): the Spark trainer must
replay the pure-Python reference merge-for-merge (count, greedy-merge,
and tie-break semantics all pinned), and the encoder must be the
inverse view of training."""
import pytest
from pyspark.sql import functions as F

from chillastic_spark.operators import bpe
from chillastic_spark.operators.bpe import train_bpe

CORPUS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest",
    "low low low new new wide",
]


@pytest.fixture(scope="module")
def trained(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text: string")
    merges = bpe.train_bpe(df, n_merges=12)
    wc = {
        r["word"]: r["wc"]
        for r in bpe.word_frequencies(df).collect()
    }
    return df, merges, wc


def test_spark_training_matches_local_replay(trained):
    df, merges, wc = trained
    assert merges == bpe.train_bpe_local(wc, n_merges=12)
    assert len(merges) >= 8  # corpus supports plenty of merges


def test_first_merges_capture_corpus_structure(trained):
    _, merges, _ = trained
    # 'low'(x7) and 'new'(x8) dominate: their character merges must be
    # learned, and a frequent merged symbol must appear as a merge side
    flat = ["".join(p) for p in merges]
    assert any("ne" in s or "ew" in s for s in flat)
    assert any("lo" in s or "ow" in s for s in flat)
    assert any(len(a) > 1 or len(b) > 1 for a, b in merges)  # hierarchical


def test_min_pair_count_stops_training(spark):
    df = spark.createDataFrame([("aa bb",)], "text: string")
    # every pair occurs once → below min_pair_count=2 → no merges
    assert bpe.train_bpe(df, n_merges=5, min_pair_count=2) == []


def test_encode_words_matches_trained_vocab(spark, trained):
    df, merges, wc = trained
    words = spark.createDataFrame([(w,) for w in wc], "word: string")
    enc = {r["word"]: list(r["bpe"]) for r in
           bpe.encode_words(words, merges).collect()}
    # local replay of encoding (the shared merge_local semantics)
    for w in wc:
        assert enc[w] == bpe.encode_local(w, merges), w
    # compression: frequent words collapse to fewer symbols than chars
    assert len(enc["low"]) < len("low") + 1
    assert len(enc["new"]) < len("new") + 1


def test_training_is_deterministic(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text: string")
    assert bpe.train_bpe(df, n_merges=6) == bpe.train_bpe(df, n_merges=6)


def test_training_on_real_corpus(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe.train_bpe(d, n_merges=5)
    wc = {r["word"]: r["wc"] for r in bpe.word_frequencies(d).collect()}
    assert merges == bpe.train_bpe_local(wc, n_merges=5)
    assert len(merges) == 5


def test_train_bpe_batched_parity_real_corpus(spark):
    """batch_m=4 must learn the SAME ordered merge list as sequential
    batch_m=1 on the real documents corpus (the non-interacting-prefix
    rule preserves sequential semantics exactly here), in strictly
    fewer aggregation rounds."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(150)
    seq_stats, bat_stats = {}, {}
    seq = train_bpe(docs, n_merges=16, stats=seq_stats)
    bat = train_bpe(docs, n_merges=16, batch_m=4, stats=bat_stats)
    assert bat == seq
    assert len(seq) == 16
    assert seq_stats["rounds"] == 16
    # real-text top pairs share common characters, so interaction
    # stops keep rounds above the ideal ceil(16/4)=4 — but batching
    # must still beat one-job-per-merge
    assert bat_stats["rounds"] < seq_stats["rounds"]


def test_train_bpe_batched_prefix_stops_on_interaction(spark):
    """A candidate sharing a symbol with an earlier in-batch selection
    must NOT merge in the same round — the corpus 'aaaa bbbb aaab'
    makes (a,a) and (aa,aa)/(a,b)-style interactions inevitable, and
    batched output must still equal sequential."""
    rows = [(i, "aaaa bbbb aaab ccdd") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    seq = train_bpe(docs, n_merges=8, min_pair_count=1)
    bat = train_bpe(docs, n_merges=8, min_pair_count=1, batch_m=8)
    assert bat == seq


def test_batched_rounds_hit_the_ideal_bound_on_disjoint_vocab(spark):
    """R5 verdict #6 (the 32k-vocab scale shape): when the top
    candidates are pairwise non-interacting, batch_m=32 must admit a
    FULL batch per aggregation round — 64 merges in exactly 2 rounds,
    with exact sequential parity. 64 words over disjoint alphabets,
    each 'xyxy' so the (x,y) pair (count 2c) outranks its own EOW pair
    (count c) and no tie interleaves the admission order."""
    from chillastic_spark.operators.bpe import train_bpe_local, word_frequencies

    words = [
        (chr(0x4E00 + 2 * i) + chr(0x4E00 + 2 * i + 1)) * 2 for i in range(64)
    ]
    rows = [(i, " ".join([w] * (100 + i))) for i, w in enumerate(words)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    stats = {}
    bat = train_bpe(docs, n_merges=64, batch_m=32, stats=stats)
    assert len(bat) == 64
    assert stats["rounds"] == 2  # ceil(64/32): every round admits a full batch
    wf = {r["word"]: r["wc"] for r in word_frequencies(docs).collect()}
    assert bat == train_bpe_local(wf, n_merges=64)


def test_batched_m32_first_round_is_exact_sequential_prefix(spark):
    """batch_m=32 on the real corpus: the first admitted batch must be
    a PREFIX of the sequential merge order (the documented exactness
    window), and total aggregation rounds must undercut
    one-job-per-merge even though this corpus's head pairs share
    symbols heavily (admission is corpus-dependent; the disjoint-vocab
    test above pins the ideal bound)."""
    from chillastic_spark.operators.bpe import train_bpe_local, word_frequencies

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = {}
    bat = train_bpe(docs, n_merges=48, batch_m=32, stats=stats)
    assert stats["rounds"] < len(bat)  # strictly fewer jobs than merges
    wf = {r["word"]: r["wc"] for r in word_frequencies(docs).collect()}
    seq = train_bpe_local(wf, n_merges=48)
    # the whole first round (and possibly more) matches sequential
    k = 0
    while k < min(len(bat), len(seq)) and bat[k] == seq[k]:
        k += 1
    assert k >= 1 and bat[:k] == seq[:k]
