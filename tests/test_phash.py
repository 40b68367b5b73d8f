"""pHash image near-dup tests: determinism, locality (small payload
edits → small Hamming distance), separation (unrelated payloads → far),
pigeonhole recall, and plan shape."""
import pyspark.sql.functions as F
from pyspark.sql import types as T

from chillastic_spark.operators import multimodal as M
from chillastic_spark.tables import load

SF = "/root/testdata/sf0.001"

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _payload_df(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)], _SCHEMA
    )


def _base_bytes():
    # deterministic pseudo-image bytes with real structure (not constant)
    return bytes((i * 37 + (i >> 3) * 11) % 251 for i in range(1024))


def test_phash_is_deterministic_and_zero_for_identical(spark):
    base = _base_bytes()
    df = _payload_df(spark, [base, base])
    h = {r["doc_id"]: r["phash"] for r in M.phash_images(df, fake=True).collect()}
    assert h[0] == h[1]
    h2 = {r["doc_id"]: r["phash"] for r in M.phash_images(df, fake=True).collect()}
    assert h == h2


def test_phash_locality_and_separation(spark):
    base = _base_bytes()
    near = bytearray(base)
    for i in range(0, 16):  # perturb 16 of 1024 bytes slightly
        near[i * 8] = (near[i * 8] + 3) % 251
    far = bytes((i * 101 + 7) % 251 for i in range(1024))
    df = _payload_df(spark, [base, bytes(near), far])
    h = {r["doc_id"]: r["phash"] for r in M.phash_images(df, fake=True).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h[0], h[1]) <= 6          # near-dup stays close
    assert ham(h[0], h[2]) > 12          # unrelated lands far


def test_phash_pairs_finds_near_dups_not_unrelated(spark):
    base = _base_bytes()
    near = bytearray(base)
    near[0] = (near[0] + 1) % 251
    far = bytes((i * 101 + 7) % 251 for i in range(1024))
    df = _payload_df(spark, [base, bytes(near), far])
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in M.phash_pairs(M.phash_images(df, fake=True), max_hamming=6).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_phash_pairs_full_recall_on_planted_dups(spark):
    """Plant an exact duplicate of EVERY corpus doc under a shifted id:
    the banded join must recover all n planted pairs at Hamming 0 —
    full recall at corpus scale, not just on toy payloads."""
    d = load(spark, SF, "documents")
    p = M.with_binary_payload(d).select("doc_id", "payload")
    n = p.count()
    planted = p.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    pairs = M.phash_pairs(
        M.phash_images(p.unionByName(planted), fake=True), max_hamming=0
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {
        (r["doc_id"], r["doc_id"] + 1_000_000) for r in p.select("doc_id").collect()
    }
    assert want <= got  # every planted dup recovered
    assert all(r["hamming"] == 0 for r in pairs)
    assert n > 0


def test_phash_pairs_plan_has_no_cartesian(spark):
    d = load(spark, SF, "documents")
    p = M.with_binary_payload(d)
    plan = (
        M.phash_pairs(M.phash_images(p, fake=True))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------- real decode (PIL-gated)

def _pil():
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


import pytest  # noqa: E402


@pytest.mark.skipif(_pil() is None, reason="PIL not installed")
def test_phash_real_png_decode(spark):
    """With PIL present, pHash runs on REAL PNG bytes: identical images
    hash identically, a lightly-edited image stays close, an unrelated
    image lands far (the same contract the fake path pins)."""
    import io

    import numpy as np

    Image = _pil()

    def png(arr):
        img = Image.fromarray(arr.astype("uint8"), mode="L")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, size=(64, 64))
    near = base.copy()
    near[:4, :4] = 0  # small local edit
    other = rng.integers(0, 255, size=(64, 64))
    df = _payload_df(spark, [png(base), png(base), png(near), png(other)])
    h = {r["doc_id"]: r["phash"] for r in M.phash_images(df, fake=False).collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert h[0] == h[1]
    assert ham(h[0], h[2]) <= 12
    assert ham(h[0], h[3]) > ham(h[0], h[2])


@pytest.mark.skipif(_pil() is None, reason="PIL not installed")
def test_decode_and_resize_real_png(spark):
    import io

    import numpy as np

    Image = _pil()
    img = Image.fromarray(
        (np.arange(40 * 30) % 255).reshape(30, 40).astype("uint8"), mode="L"
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = _payload_df(spark, [buf.getvalue()])
    meta = M.decode_media(df, fake=False).collect()[0]
    assert (meta["width"], meta["height"], meta["format"]) == (40, 30, "png")
    out = M.resize_images(df, width=16, height=16, fake=False).collect()[0]
    with Image.open(io.BytesIO(bytes(out["payload"]))) as r:
        assert r.size == (16, 16)
