"""Value-level LOCAL TWINS for the rows-only queries (r5 verdict #1).

Every ``queries()`` entry without an ``oracle_sql()`` twin (sketches,
ANN, codec, iterative BPE — the ones whose cross-engine exact oracle
cannot exist) gets a pure-Python/duckdb exact check here, run by
scripts/check.py right after the rows-only row-count: either an exact
recompute of the full output (hash-exact where the fake-decode payload
is deterministic) or the operator's published error/recall bound
evaluated against exact ground truth computed locally.

Each twin: (spark_result_pandas, sf_dir, duckdb_con) -> (ok, detail).
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd

# ---------------------------------------------------------- helpers


def _docs(con) -> pd.DataFrame:
    return con.sql("SELECT doc_id, text FROM documents").df()


def _fail(msg: str) -> tuple[bool, str]:
    return False, msg


def _ok(msg: str) -> tuple[bool, str]:
    return True, msg


def _round_det(x: np.ndarray | float, d: int = 6):
    """floor(x*10^d + 0.5)/10^d — the deterministic half-up rounding of
    chillastic_spark.functions.round_det, reimplemented independently."""
    p = 10.0 ** d
    return np.floor(np.asarray(x, dtype=np.float64) * p + 0.5) / p


# ------------------------------------------------------------ sketches


def sketch_distinct_users(sdf, sf_dir, con):
    """HLL++ rsd=0.01: per-group estimate within 5% of exact distinct
    (5 standard errors — far beyond any plausible HLL excursion)."""
    exact = con.sql(
        "SELECT event_type, count(DISTINCT user_id) AS c FROM events GROUP BY 1"
    ).df().set_index("event_type")["c"]
    worst = 0.0
    for _, r in sdf.iterrows():
        true = int(exact[r["event_type"]])
        rel = abs(int(r["approx_users"]) - true) / max(true, 1)
        worst = max(worst, rel)
        if rel > 0.05:
            return _fail(
                f"{r['event_type']}: approx {r['approx_users']} vs exact "
                f"{true} (rel err {rel:.4f} > 0.05)"
            )
    if set(sdf["event_type"]) != set(exact.index):
        return _fail("event_type group set mismatch")
    return _ok(f"all {len(sdf)} groups within 5% of exact distinct (worst {worst:.4f})")


def sketch_value_quantiles(sdf, sf_dir, con):
    """GK accuracy=10000: each returned quantile's value-rank interval
    [#<v, #<=v] must overlap the target rank ± n/10000 (+1 slack)."""
    # completeness: a dropped event_type group would otherwise pass
    # (the loop only checks groups that ARE present)
    want = {
        r[0] for r in con.sql("SELECT DISTINCT event_type FROM events").fetchall()
    }
    got = set(sdf["event_type"])
    if got != want:
        return _fail(f"event_type groups {sorted(got)} != {sorted(want)}")
    worst = 0.0
    for _, r in sdf.iterrows():
        et = r["event_type"].replace("'", "''")
        n = con.sql(
            f"SELECT count(*) c FROM events WHERE event_type='{et}'"
        ).fetchone()[0]
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
            v = float(r[col])
            lt, le = con.sql(
                f"SELECT count(*) FILTER (value < {v!r}), "
                f"count(*) FILTER (value <= {v!r}) "
                f"FROM events WHERE event_type='{et}'"
            ).fetchone()
            target, eps = q * n, n / 10000 + 1
            # rank interval of v is [lt+1, le]; GK guarantees some rank
            # within eps of target
            gap = max(target - le, (lt + 1) - target, 0)
            worst = max(worst, gap - eps)
            if gap > eps:
                return _fail(
                    f"{r['event_type']} {col}={v}: rank interval "
                    f"[{lt + 1},{le}] misses target {target:.1f} ± {eps:.1f}"
                )
    return _ok("all quantiles within the GK rank-error bound vs exact sorted data")


def heavy_hitter_terms(sdf, sf_dir, con):
    """Misra-Gries contract (operators/sketches.py): for every returned
    token, est <= true <= est + err_bound, with true counts exact."""
    true = con.sql(
        r"""SELECT tok, count(*) AS c FROM (
              SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
              FROM documents) WHERE tok != '' GROUP BY tok"""
    ).df().set_index("tok")["c"]
    for _, r in sdf.iterrows():
        t = true.get(r["token"], 0)
        if not (r["est"] <= t <= r["est"] + r["err_bound"]):
            return _fail(
                f"token {r['token']!r}: est {r['est']} err {r['err_bound']} "
                f"but true {t}"
            )
    return _ok(
        f"all {len(sdf)} terms satisfy est <= true <= est+err vs exact counts"
    )


# ------------------------------------------------------ approx deciles


def balance_deciles_approx(sdf, sf_dir, con):
    """Exact recompute: the value-bucketing rule (decile = 1 + #cuts
    below) means bucket d is exactly (max_bal(d-1), max_bal(d)] on the
    real data — recompute n/min/max/sum per bucket from the exact
    values and require equality, then check each cut's rank against
    the sketch bound (accuracy 10000 -> eps = n/10000, + the tie run
    at the cut, + 1 slack)."""
    vals = np.sort(
        con.sql("SELECT c_acctbal FROM customer").df()["c_acctbal"].to_numpy()
    )
    n = len(vals)
    out = sdf.sort_values("decile").reset_index(drop=True)
    if int(out["n_customers"].sum()) != n:
        return _fail(f"counts sum {out['n_customers'].sum()} != {n}")
    lo = -math.inf
    cum = 0
    for _, r in out.iterrows():
        hi = float(r["max_bal"])
        in_b = vals[(vals > lo) & (vals <= hi)]
        cum += len(in_b)
        if len(in_b) != int(r["n_customers"]):
            return _fail(
                f"decile {r['decile']}: exact bucket has {len(in_b)} rows, "
                f"spark says {r['n_customers']}"
            )
        if float(in_b.min()) != float(r["min_bal"]) or float(in_b.max()) != hi:
            return _fail(f"decile {r['decile']}: min/max mismatch")
        want = round(float(np.sum(np.round(in_b, 2))), 2)
        if abs(want - float(r["sum_bal"])) > 0.01:
            return _fail(
                f"decile {r['decile']}: sum {r['sum_bal']} vs exact {want}"
            )
        d = int(r["decile"])
        if d < 10:
            ties = int((vals == hi).sum())
            eps = n / 10000 + ties + 1
            if abs(cum - d * n / 10) > eps:
                return _fail(
                    f"cut {d}: cumulative rank {cum} vs target {d * n / 10} "
                    f"exceeds sketch bound ±{eps}"
                )
        lo = hi
    return _ok(
        f"per-decile n/min/max/sum exactly match the value-bucketed "
        f"recompute over {n} rows; all 9 cuts within the sketch rank bound"
    )


# ------------------------------------------------------------ BPE


def bpe_trained_merges(sdf, sf_dir, con):
    """Exact: pure-Python greedy BPE replay (train_bpe_local, the unit
    -test oracle) on independently recomputed word frequencies must
    reproduce the merge list rank-for-rank."""
    from collections import Counter

    from chillastic_spark.operators.bpe import train_bpe_local

    wc: Counter = Counter()
    for t in _docs(con)["text"]:
        for w in str(t).lower().strip().split():
            if w:
                wc[w] += 1
    merges = train_bpe_local(dict(wc), n_merges=10, min_pair_count=2)
    got = [(r["left"], r["right"]) for _, r in sdf.sort_values("rank").iterrows()]
    if got != merges:
        return _fail(f"merge lists diverge: spark {got[:3]}… vs local {merges[:3]}…")
    for _, r in sdf.iterrows():
        if r["merged"] != r["left"] + r["right"]:
            return _fail(f"rank {r['rank']}: merged != left+right")
    return _ok(f"all {len(got)} merges hash-exact vs the pure-Python greedy replay")


# ------------------------------------------------------- multimodal


def _phash64(buf1024: bytes) -> int:
    """Independent numpy reimplementation of the fake-decode pHash:
    tile bytes into 32x32, 2D DCT-II (orthonormal-free form), top-left
    8x8 sans DC, sign vs median."""
    N = 32
    k = np.arange(N)
    dct = np.cos(np.pi * (k[None, :] + 0.5) * k[:, None] / N)
    plane = np.frombuffer(buf1024, dtype=np.uint8).astype(np.float64).reshape(N, N)
    freq = dct @ plane @ dct.T
    low = freq[:8, :8].copy()
    low[0, 0] = 0.0
    flat = low.reshape(64)
    med = np.median(flat)
    bits = flat > med
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h - (1 << 64) if h >= (1 << 63) else h  # wrap to signed int64


def image_phash_pairs(sdf, sf_dir, con):
    """Exact recompute: canon = first 48 chars of the whitespace-
    collapsed lowercased text, payload = utf-8 bytes tiled to 1024,
    pHash per doc, then ALL pairs with Hamming <= 6 (the pigeonhole
    banding is complete for <= chunks-1 = 7, so the exact pair set is
    the contract, not a recall target)."""
    import re

    docs = _docs(con)
    hashes = {}
    for _, r in docs.iterrows():
        canon = re.sub(r"\s+", " ", str(r["text"]).lower().strip())[:48]
        base = canon.encode("utf-8") or b"\x00"
        buf = (base * (1024 // len(base) + 1))[:1024]
        hashes[int(r["doc_id"])] = _phash64(buf)
    ids = sorted(hashes)
    h = np.array([hashes[i] for i in ids], dtype=np.int64).view(np.uint64)
    want = set()
    for i in range(len(ids)):
        x = h[i] ^ h[i + 1 :]
        ham = np.array([bin(int(v)).count("1") for v in x])
        for j in np.nonzero(ham <= 6)[0]:
            want.add((ids[i], ids[i + 1 + j], int(ham[j])))
    got = {
        (int(r["id_a"]), int(r["id_b"]), int(r["hamming"]))
        for _, r in sdf.iterrows()
    }
    if got != want:
        return _fail(
            f"pair sets differ: spark {len(got)} vs exact {len(want)} "
            f"(spark-only {sorted(got - want)[:3]}, "
            f"exact-only {sorted(want - got)[:3]})"
        )
    return _ok(f"all {len(want)} Hamming<=6 pairs hash-exact vs numpy pHash recompute")


def audio_features_meta(sdf, sf_dir, con):
    """Exact recompute of the deterministic fake-PCM feature path:
    payload bytes tiled to 8000, int16 PCM, 400/160 framing, RMS + ZCR
    — all in independent numpy, compared per-doc to 1e-9."""
    docs = _docs(con).set_index("doc_id")["text"]
    # completeness: a doc silently dropped from the output would pass
    # the per-row loop below
    if set(sdf["doc_id"].astype(int)) != set(docs.index.astype(int)):
        return _fail(
            f"{len(sdf)} output docs != {len(docs)} corpus docs"
        )
    for _, r in sdf.iterrows():
        payload = str(docs[int(r["doc_id"])]).encode("utf-8")
        pcm = (
            np.frombuffer(
                (payload * ((8000 // max(len(payload), 1)) + 1))[:8000],
                dtype=np.int16,
            ).astype(np.float64)
            / 32768.0
        )
        n = pcm.shape[0]
        if n >= 400:
            n_frames = 1 + (n - 400) // 160
            idx = np.arange(400)[None, :] + 160 * np.arange(n_frames)[:, None]
            fr = pcm[idx]
            rms = np.sqrt((fr * fr).mean(axis=1))
        else:
            n_frames, rms = 0, np.array([0.0])
        zc = (
            float((np.signbit(pcm[1:]) != np.signbit(pcm[:-1])).mean())
            if n > 1
            else 0.0
        )
        if int(r["n_samples"]) != n or int(r["n_frames"]) != n_frames:
            return _fail(f"doc {r['doc_id']}: sample/frame count mismatch")
        for col, v in (
            ("mean_rms", rms.mean()),
            ("max_rms", rms.max()),
            ("zcr", zc),
        ):
            if abs(float(r[col]) - float(v)) > 1e-9:
                return _fail(
                    f"doc {r['doc_id']} {col}: {r[col]} vs exact {v}"
                )
    return _ok(f"all {len(sdf)} docs' features exact vs independent numpy recompute")


# ------------------------------------------------------------ ANN


def _hash60_py(s: str) -> int:
    """stdlib twin of chillastic_spark.functions.hash60 (md5 → first
    15 hex digits → int) — lets this module reproduce the engine's
    hash-selected ANN query set without Spark."""
    import hashlib

    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def _ann_truth(con, k=10, n_queries=32):
    e = con.sql("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").df()
    V = np.array(e["embedding"].tolist(), dtype=np.float64)
    ids = e["vec_id"].to_numpy()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    # id-keyed, not positional: row qi of the sorted frame is only the
    # query-qi vector while vec_ids happen to be 0-based contiguous —
    # a regenerated corpus with gapped/1-based ids would silently score
    # ground truth against the WRONG vectors. Query set = the same
    # 32-smallest-hash60 sample the registered queries draw
    # (queries/vectors._ann_query_set): r9 raised the recall floors and
    # the old 5-fixed-id set promptly mismeasured the system — at sf1
    # ids 0-4 have diffuse neighborhoods (top cos ~0.4-0.5) where NO
    # sublinear probe recalls well; a hash-spread sample is the
    # standard ANN-benchmark shape.
    row_of = {int(i): r for r, i in enumerate(ids)}
    qids = sorted((int(i) for i in ids), key=lambda i: (_hash60_py(i), i))
    truth, cos = {}, {}
    for qid in sorted(qids[:n_queries]):
        c = _round_det(Vn @ Vn[row_of[qid]])
        order = np.lexsort((ids, -c))
        top = [int(ids[j]) for j in order if int(ids[j]) != qid][:k]
        truth[qid] = top
        cos[qid] = {int(i): float(v) for i, v in zip(ids, c)}
    return truth, cos


def _ann_twin(sdf, con, floor, what):
    truth, cos = _ann_truth(con)
    # completeness FIRST: a probe bug that empties whole query groups
    # must fail loudly, not quietly average recall over the survivors
    got_q = {int(q) for q in sdf["query_id"].unique()}
    if got_q != set(truth):
        return _fail(f"query groups {sorted(got_q)} != expected {sorted(truth)}")
    hits = tot = 0
    for qi, grp in sdf.groupby("query_id"):
        if len(grp) != 10:
            return _fail(f"query {qi}: {len(grp)} rows, want 10")
        for _, r in grp.iterrows():
            want = cos[int(qi)][int(r["neighbor_id"])]
            if abs(float(r["cos"]) - want) > 1e-6:
                return _fail(
                    f"query {qi} neighbor {r['neighbor_id']}: cos "
                    f"{r['cos']} vs exact {want}"
                )
        hits += len(set(grp["neighbor_id"].astype(int)) & set(truth[int(qi)]))
        tot += 10
    recall = hits / tot
    if recall < floor:
        return _fail(f"recall@10 {recall:.2f} < {floor} vs brute-force exact")
    return _ok(
        f"every returned cos exact to 1e-6 vs numpy brute force; "
        f"recall@10 {recall:.2f} >= {floor} ({what})"
    )


def embedding_dup_pairs_unblocked(sdf, sf_dir, con):
    """Precision-exact + measured-recall twin for the LSH-bucketed
    unblocked dedup (threshold 0.4, planes=3, probes=2, tables=6 — the
    registered query's parameters). Ground truth is the full numpy
    all-pairs matrix: every emitted pair must BE a true >=0.4 pair
    with the exact rounded cosine (precision 1 by construction — any
    violation is a bug, not an approximation), and recall must clear
    0.9 (r11 calibrated table count — measured 0.970 sf0.001 / 0.966
    sf0.01 / 0.964 sf0.1, the whole tables∈{5..8} curve in
    scripts/sweep_unblocked_r11.py; tables=8 measured 0.983–0.989 at
    ~1.45x the candidate volume)."""
    e = con.sql("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").df()
    V = np.array(e["embedding"].tolist(), dtype=np.float64)
    ids = e["vec_id"].to_numpy()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = _round_det(Vn @ Vn.T, 4)
    iu = np.triu_indices(len(V), 1)
    truth = {
        (int(ids[i]), int(ids[j])): float(C[i, j])
        for i, j in zip(*iu)
        if C[i, j] >= 0.4
    }
    got = {}
    for r in sdf.itertuples(index=False):
        key = (int(r.id_a), int(r.id_b))
        if key in got:
            return _fail(f"pair {key} emitted twice")
        got[key] = float(r.cos)
    for key, cos in got.items():
        want = truth.get(key)
        if want is None:
            return _fail(f"false positive pair {key} cos={cos}")
        if abs(cos - want) > 1e-12:
            return _fail(f"pair {key}: cos {cos} vs exact {want}")
    if not truth:
        return _fail("ground truth empty — corpus regenerated?")
    recall = len(got) / len(truth)
    if recall < 0.9:
        return _fail(
            f"recall {recall:.3f} < 0.9 vs all-pairs exact"
            f" ({len(got)}/{len(truth)})"
        )
    return _ok(
        f"all {len(got)} emitted pairs exact vs numpy all-pairs; "
        f"recall {recall:.3f} >= 0.9 (lsh planes=3 tables=6 probes=2)"
    )


def ann_ivf_topk(sdf, sf_dir, con):
    """Value-exact scores + brute-force recall floor for the IVF path.
    r9: cells corpus-adaptive (~512 rows/cell), nprobe auto
    (max(3, cells/2)), floor 0.5 → 0.8 — measured on HELD-OUT
    hash-spread queries: 0.86 at sf0.01 (4 cells, nprobe 3) and 0.83
    at sf1 (32 cells, nprobe 16). The first sweep's 0.88-at-9%-scan
    was train/test contamination (queries drawn from the quantizer's
    own training sample); on this isotropic corpus honest recall
    tracks the scanned fraction — the config pays the documented
    ~50–75% scan to hold the floor."""
    return _ann_twin(
        sdf, con, 0.8, "ivf cells=auto(~512/cell) nprobe=auto(cells/2)"
    )


def ann_pq_topk(sdf, sf_dir, con):
    """Value-exact re-ranked scores + recall floor for PQ ADC+refine.
    The r8 config (8-bit codebooks, 10xk shortlist — raised after the
    sf1 run caught the 4-bit/5xk config at recall 0.50 on 10x data)
    measures 1.00 at sf0.01 and 0.96 at sf1; floor 0.8.

    NB (ADVICE r10): PQ codes/centroids are IMPLEMENTATION-DEFINED at
    k-means distance ties — the matmul-form argmin (r10) and the
    vectorized update (r11) are pinned bit-exact against the textbook
    reference on the shipped corpora (test_pq_fast_assign), but two
    distinct centroids equidistant to ~1e-14 could in principle
    assign differently on a new corpus. The twin is robust to that by
    construction: emitted scores are refine-stage exact cosines and
    only the recall floor depends on the candidate set."""
    return _ann_twin(sdf, con, 0.8, "pq m=16 k=256 refine=10")


def ann_ivf_pq_topk(sdf, sf_dir, con):
    """Value-exact re-ranked scores + recall floor for the IVF-PQ
    composite. Recall is bounded by the coarse probe — the 8-bit PQ
    stage and 10xk shortlist lose ≤1% further (SWEEP_ann_r09 refine
    curve) — so the r9 adaptive cells/nprobe raise this floor with
    ann_ivf_topk's: 0.5 → 0.8."""
    return _ann_twin(
        sdf,
        con,
        0.8,
        "ivfpq cells=auto(~512/cell) nprobe=auto(cells/2) m=16 k=256 refine=10",
    )


TWINS = {
    "sketch_distinct_users": sketch_distinct_users,
    "sketch_value_quantiles": sketch_value_quantiles,
    "heavy_hitter_terms": heavy_hitter_terms,
    "balance_deciles_approx": balance_deciles_approx,
    "bpe_trained_merges": bpe_trained_merges,
    "image_phash_pairs": image_phash_pairs,
    "audio_features_meta": audio_features_meta,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_pq_topk": ann_pq_topk,
    "ann_ivf_pq_topk": ann_ivf_pq_topk,
    "embedding_dup_pairs_unblocked": embedding_dup_pairs_unblocked,
}
