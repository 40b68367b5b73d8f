"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (broadcast the query set, fold the
dot product JVM-side). Scale path: random-hyperplane LSH bucketing —
probe only matching buckets, turning the O(N·Q) scan into a bucket
equi-join. Hyperplane components derive from the oracle-reproducible
60-bit hash so the bucketing itself is deterministic and testable.
"""
from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chillastic_spark import functions as CF

_LOG = logging.getLogger("chillastic_spark.similarity")

# stage name -> the Spark accumulator counting rows the LAST plan built
# by that stage will silently drop (NULL / off-width / NaN vectors).
# Populated when ivf_assign_cells / pq_encode build a plan; the value
# is meaningful after an action runs. Exists so a mixed-width corpus
# losing a large fraction of the ANN index is VISIBLE (r8 ADVICE)
# rather than only discoverable through recall twins.
DROP_COUNTERS: dict = {}


def _track_drops(df: DataFrame, stage: str):
    acc = df.sparkSession.sparkContext.accumulator(0)
    DROP_COUNTERS[stage] = acc
    return acc


def clean_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Rows with a USABLE vector: non-NULL, no NULL element, no NaN
    element. THE dirty-vector gate every similarity operator applies up
    front (and every DuckDB oracle mirrors): a NULL element
    NULL-poisons each JVM cosine silently, while DuckDB's
    list_dot_product hard-ERRORS on it — without one shared exclusion
    the engine and its oracles cannot even agree on whether the query
    runs. Data NaN is the same class of poison with the OPPOSITE
    failure mode: both Spark's sort and DuckDB's comparison order NaN
    GREATEST, so a NaN cosine ranks FIRST in any desc top-k — and the
    Arrow fast paths (brute_force_topk_fast, ivf_assign_cells) already
    drop NaN rows batch-side, so keeping them here split the "exact"
    twins. One convention everywhere: a non-finite vector cannot be
    anyone's neighbor."""
    return df.filter(
        F.col(vec_col).isNotNull()
        & ~F.exists(F.col(vec_col), lambda v: v.isNull())
        & ~F.exists(F.col(vec_col), lambda v: F.isnan(v))
    )


# the DuckDB spelling of clean_vectors' predicate, interpolated into
# the oracle WITH-clauses (queries/vectors.py, queries/search.py).
# NaN clause mirrors the engine gate: isnan(NULL) is NULL in DuckDB,
# but the NULL-element clause already excludes those rows, so the
# conjunction is well-defined on every input.
CLEAN_VECTORS_SQL = (
    "{col} IS NOT NULL AND len(list_filter({col}, x -> x IS NULL)) = 0"
    " AND len(list_filter({col}, x -> isnan(x))) = 0"
)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbours by cosine for each query vector.

    ``queries`` (small: (query_id, embedding)) is broadcast; the corpus
    is scanned once. Ranking uses the ROUNDED cosine with id tie-break
    so results are bit-stable across engines. Returns
    (query_id, neighbor_id, cos) with k rows per query.
    """
    # dirty vectors score nothing (a NULL/NULL-element cos would
    # otherwise pad the top-k with junk rows whenever a query has < k
    # real candidates — and diverge from brute_force_topk_fast and the
    # DuckDB oracle, which cannot even evaluate NULL elements)
    v = clean_vectors(vectors, vec_col).select(
        F.col(id_col).alias("neighbor_id"), CF.as_double_array(vec_col).alias("vec")
    )
    q = clean_vectors(queries, vec_col).select(
        F.col(query_id_col).alias("query_id"), CF.as_double_array(vec_col).alias("qvec")
    )
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", CF.round_det(CF.cosine(F.col("vec"), F.col("qvec")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    return _rank_topk(scored, k)


def _empty_topk(
    spark,
    score_col: str = "cos",
    qid_t: str = "long",
    nid_t: str = "long",
) -> DataFrame:
    """Schema-stable empty result for the no-queries edge (an empty
    collect would otherwise reach numpy as a 1-D array and crash with
    AxisError on axis=1). ``qid_t``/``nid_t`` carry the caller's id
    TYPES so the empty edge has the same schema as the non-empty path
    (a string-id caller must not get back long columns)."""
    return spark.createDataFrame(
        [], f"query_id {qid_t}, neighbor_id {nid_t}, {score_col} double"
    )


def _id_type(df: DataFrame, col: str) -> str:
    """The caller's id column type as a DDL string — every *_topk that
    round-trips ids through createDataFrame/mapInPandas must carry it
    (hardcoding long crashes string-id callers; see ann_query_ivf_index
    history)."""
    return df.schema[col].dataType.simpleString()


def _rank_topk(
    scored: DataFrame,
    k: int,
    part_col: str = "query_id",
    score_col: str = "cos",
    ascending: bool = False,
    id_col: str = "neighbor_id",
) -> DataFrame:
    """THE per-group top-k ranking every *_topk operator (and the
    index serving path) uses: row_number over (score, id-tie-break)
    partitioned by the query/node — one definition, so a tie-break fix
    can never apply to one copy and silently diverge in another. The
    PARTITIONED window compiles to WindowGroupLimit (each map task
    keeps k rows per group before the shuffle) — never a global sort."""
    from pyspark.sql.window import Window

    order = F.asc(score_col) if ascending else F.desc(score_col)
    w = Window.partitionBy(part_col).orderBy(order, F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(part_col, id_col, score_col)
    )


def _unit_rows(M):
    """Row-normalize, mapping zero-norm rows to the zero vector
    (cos 0 against everything) instead of NaN-poisoning the scores."""
    import numpy as np

    n = np.linalg.norm(M, axis=1, keepdims=True)
    return M / np.where(n == 0, 1.0, n)


def _majority_dim(vecs, stage: str = "quantizer") -> int:
    """The width a driver-side training sample agrees on: the most
    common vector length, ties to the SMALLER width (deterministic).
    Mixed-width corpora exist in real pipelines (two embedding models
    in one table); np.array over a ragged sample raises ValueError and
    kills the whole job, so every quantizer trains on the majority
    width and off-width rows drop at assignment/scoring — the same
    cross-dimension-pairs-drop convention the zip_with cosine fold
    established. A mixed sample is LOGGED with the width histogram
    (r8 ADVICE): a near-50/50 two-model corpus silently losing half
    its rows from the serving path must be visible, not only
    discoverable through recall twins."""
    from collections import Counter

    counts = Counter(len(v) for v in vecs)
    if not counts:
        raise ValueError("no vectors to measure a width from")
    dim = min(
        (d for d, c in counts.items() if c == max(counts.values())),
    )
    if len(counts) > 1:
        total = sum(counts.values())
        _LOG.warning(
            "%s: mixed-width training sample — training on width %d "
            "(%d/%d rows, %.0f%%); off-width rows drop from the index "
            "at assignment. widths=%s",
            stage,
            dim,
            counts[dim],
            total,
            100.0 * counts[dim] / total,
            dict(sorted(counts.items())),
        )
    return dim


def block_pair_replicate(
    v: DataFrame, keys: "list[str]", id_col: str, block_size: int
) -> DataFrame:
    """THE block-pair-grid fan-out shared by every pairwise matmul
    scorer (dedup.embedding_dup_pairs, knn_graph): rows hash into
    ceil(n/block_size) blocks per ``keys`` group and each row is
    replicated to every (block_i ≤ block_j) task it participates in —
    left side (role 0) of tasks (blk, k≥blk), right side (role 1) of
    tasks (k<blk, blk); exactly nb copies per row, the standard
    distributed block-nested-loop fan-out, linear in nb. Group the
    result by (*keys, ci, cj); no task ever holds more than two
    blocks, so a group larger than any executor's memory still works.

    Per-group block counts ride a broadcast join (one tiny row per
    group — the corpus side never shuffles for them); keys match
    null-safely, so NULL-keyed rows stay one group."""
    sizes = v.groupBy(*[F.col(c).alias(f"_bp_{c}") for c in keys]).agg(
        F.ceil(F.count(F.lit(1)) / F.lit(block_size)).alias("_nb")
    )
    cond = None
    for c in keys:
        e = v[c].eqNullSafe(sizes[f"_bp_{c}"])
        cond = e if cond is None else (cond & e)
    out = v.join(F.broadcast(sizes), cond).drop(*[f"_bp_{c}" for c in keys])
    out = out.withColumn(
        "_blk", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.col("_nb"))
    )
    tasks = F.transform(
        F.sequence(F.lit(0).cast("long"), F.col("_nb") - 1),
        lambda t: F.struct(
            F.least(t, F.col("_blk")).alias("ci"),
            F.greatest(t, F.col("_blk")).alias("cj"),
            F.when(t >= F.col("_blk"), F.lit(0)).otherwise(F.lit(1)).alias("role"),
        ),
    )
    return out.withColumn("_t", F.explode(tasks)).select(
        *v.columns,
        F.col("_t.ci").alias("ci"),
        F.col("_t.cj").alias("cj"),
        F.col("_t.role").alias("role"),
    )


def brute_force_topk_fast(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """BLAS-backed exact top-k: Arrow batches → numpy matmul.

    Spark's higher-order-function fold (brute_force_topk) is
    interpreted per element, not codegen'd — fine for oracle-exact
    checks, ~10× too slow for bulk scoring. Here the query matrix is
    closure-broadcast and each Arrow batch does one V·Qᵀ; per-batch
    top-k then a global window keeps the shuffle at batches×m×k rows.
    Ranking is deterministic (score rounded to 6, id tie-break), and
    matches brute_force_topk up to fp ordering at the last ulp.
    """
    import numpy as np

    qid_t = _id_type(queries, query_id_col)
    nid_t = _id_type(vectors, id_col)
    # dirty query rows (NULL id / NULL vector) score nothing instead of
    # aborting the whole query: sorted() raises on a None key and
    # np.array on a ragged list — one bad row must not kill the job
    q_rows = sorted(
        (
            r
            for r in queries.select(query_id_col, vec_col).collect()
            if r[0] is not None
            and r[1] is not None
            and not any(x is None for x in r[1])  # clean_vectors twin
        ),
        key=lambda r: r[0],
    )
    if not q_rows:
        return _empty_topk(vectors.sparkSession, qid_t=qid_t, nid_t=nid_t)
    # PER-WIDTH query groups: a mixed-width query set made np.array
    # ragged (ValueError at plan time). This operator is EXACT, so a
    # mixed-width corpus is fully supported — each query scores
    # against the same-width corpus rows only (the cross-dimension-
    # pairs-drop convention: the zip_with fold's cosine is NULL there)
    by_dim: dict = {}
    for r in q_rows:
        by_dim.setdefault(len(r[1]), []).append(r)
    q_groups = {
        d: (
            [r[0] for r in rows],
            _unit_rows(np.array([r[1] for r in rows], dtype=np.float64)),
        )
        for d, rows in by_dim.items()
    }
    kk = k

    def score(batches):
        import numpy as np_
        import pandas as pd_

        for pdf in batches:
            if pdf.empty:
                continue
            # NULL vectors make np.array ragged (ValueError kills the
            # task) — vectorless rows score nothing. NULL ids too: a
            # long-id batch turns NULL into float64 NaN, which passes
            # 'ids != qid', enters the batch top-k, and the
            # float→long Arrow cast then kills the task (string-id
            # batches instead emitted a phantom NULL neighbor that
            # outranked real ties) — matching brute_force_topk's
            # neighbor_id != query_id three-valued drop
            pdf = pdf[pdf["_vec"].notna() & pdf["_nid"].notna()]
            # NULL elements arrive from Arrow as NaN (an `is None`
            # check is dead batch-side): the clean_vectors twin, nan-
            # aware — a poisoned row must not emit nan-cos neighbors
            pdf = pdf[pdf["_vec"].map(
                lambda a: not np_.isnan(
                    np_.asarray(a, dtype=np_.float64)
                ).any()
            )]
            if pdf.empty:
                continue
            out = []
            for dim, sub in pdf.groupby(pdf["_vec"].map(len)):
                grp = q_groups.get(dim)
                if grp is None:
                    continue  # no same-width query — nothing to score
                g_ids, Qn = grp
                ids = sub["_nid"].to_numpy()
                V = np_.array(list(sub["_vec"]), dtype=np_.float64)
                n = np_.linalg.norm(V, axis=1, keepdims=True)
                Vn = V / np_.where(n == 0, 1.0, n)
                S = Vn @ Qn.T  # (batch × m) cosines
                for j, qid in enumerate(g_ids):
                    col = S[:, j]
                    mask = ids != qid
                    cand_idx = np_.nonzero(mask)[0]
                    if len(cand_idx) == 0:
                        continue
                    take = min(kk, len(cand_idx))
                    # batch-local selection must agree with the GLOBAL
                    # ranking (rounded score desc, id asc): raw-score
                    # argpartition breaks ties by batch position, so
                    # two equal-rounded rows straddling the cutoff
                    # would make the result partition-dependent
                    rcol = np_.floor(col[cand_idx] * 1e6 + 0.5) / 1e6
                    order = np_.lexsort((ids[cand_idx], -rcol))
                    top = cand_idx[order[:take]]
                    for i in top:
                        # no int() cast: ids keep the caller's type
                        # (string ids crashed here; numpy scalars
                        # convert via Arrow)
                        out.append((qid, ids[i], float(col[i])))
            yield pd_.DataFrame(out, columns=["query_id", "neighbor_id", "cos_raw"])

    v = vectors.select(
        F.col(id_col).alias("_nid"), CF.as_double_array(vec_col).alias("_vec")
    )
    scored = v.mapInPandas(
        score, f"query_id {qid_t}, neighbor_id {nid_t}, cos_raw double"
    ).withColumn("cos", CF.round_det(F.col("cos_raw"), 6)).drop("cos_raw")
    return _rank_topk(scored, k)


def random_hyperplane_buckets(
    vec_col: str = "embedding", planes: int = 8, seed: str = "rp",
    dims: "int | None" = None,
) -> F.Column:
    """LSH bucket id (int) from ``planes`` pseudo-random hyperplanes.

    Plane p's component for dimension d is hash60(f"{seed}:{p}:{d}")
    mapped to [-1, 1) — deterministic, no state to ship. Bucket bit p =
    sign of ⟨vec, plane_p⟩.

    ``dims`` (when the embedding width is known at plan time) embeds
    the coefficient matrix as ARRAY LITERALS via
    :func:`plane_coefficients` instead of evaluating planes×dims md5
    hashes PER ROW — bit-identical bucket ids (same IEEE op order), no
    per-row hashing in the hottest path. The hashed fallback remains
    for callers that cannot know the width at plan time.
    """
    vec = CF.as_double_array(vec_col)
    bit_terms = []
    if dims is not None:
        coeffs = plane_coefficients(planes, int(dims), seed)
        for p in range(planes):
            lit_plane = F.array(*[F.lit(c) for c in coeffs[p]])
            proj = F.aggregate(
                F.zip_with(vec, lit_plane, lambda x, c: x * c),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bit_terms.append(
                F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
            )
    else:
        for p in range(planes):
            proj = F.aggregate(
                F.zip_with(
                    vec,
                    F.sequence(F.lit(0), F.size(vec) - 1),
                    lambda x, d: x
                    * (
                        (
                            CF.hash60(F.concat(F.lit(f"{seed}:{p}:"), d.cast("string")))
                            % F.lit(2000001)
                        ).cast("double")
                        / F.lit(1000000.0)
                        - F.lit(1.0)
                    ),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bit_terms.append(
                F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
            )
    bucket = bit_terms[0]
    for t in bit_terms[1:]:
        bucket = bucket + t
    return bucket.cast("int")


def probe_buckets_expr(base: F.Column, probes: int, planes: int) -> F.Column:
    """Multi-probe bucket array: the base bucket plus its ``probes-1``
    single-bit flips — THE one probe policy, shared by the scan-time
    ``lsh_topk`` and the served ``sources.vector_index`` so a policy
    change can never diverge the index from the operator."""
    return F.array(
        base,
        *[
            base.bitwiseXOR(F.lit(1 << p))
            for p in range(min(max(probes - 1, 0), planes))
        ],
    )


def _dim_mean(val: F.Column, digits: int = 6) -> F.Column:
    """THE per-dimension centroid mean: DECIMAL-sum / count, rounded —
    not the engine avg (double partial sums merge in shuffle-fetch
    order, so a mean one ulp from a rounding boundary flips across
    runs). One definition for ``centroids`` and ``centroid_arrays``."""
    return CF.round_det(
        F.sum(val.cast("decimal(28,12)")).cast("double") / F.count(F.lit(1)),
        digits,
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 6,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    At scale this is the IVF pattern: bucket the corpus once (cheap,
    column expressions only), shuffle on bucket, and each query probes
    its bucket instead of the full corpus. ``probes`` > 1 enables
    multi-probe: each query also searches the buckets at Hamming
    distance 1 from its own (probes-1 single-bit flips), trading
    probes× more candidates for recall — the standard LSH recall knob.
    """
    first_q = queries.select(CF.as_double_array(vec_col)).first()
    dims = len(first_q[0]) if first_q and first_q[0] is not None else None
    # vectorless rows score nothing: a NULL embedding projects to NULL
    # on every plane (bucket 0 by the when/otherwise) and cosines to
    # NULL — it would soak up k junk candidate slots per bucket-0 query
    v = clean_vectors(vectors, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        CF.as_double_array(vec_col).alias("vec"),
        random_hyperplane_buckets(vec_col, planes, dims=dims).alias("bucket"),
    )
    base_bucket = random_hyperplane_buckets(vec_col, planes, dims=dims)
    q = clean_vectors(queries, vec_col).select(
        F.col(query_id_col).alias("query_id"),
        CF.as_double_array(vec_col).alias("qvec"),
        F.explode(probe_buckets_expr(base_bucket, probes, planes)).alias("bucket"),
    )
    scored = (
        v.join(F.broadcast(q), ["bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])  # multi-probe overlap
        .withColumn("cos", CF.round_det(CF.cosine(F.col("vec"), F.col("qvec")), 6))
        # a NULL cosine can only be a width mismatch here (clean_vectors
        # gated NULL elements): cross-dimension pairs DROP instead of
        # filling the tail of a sparse bucket with NULL-cos edges.
        # MIRRORED in sources.vector_index.ann_query_index — the served
        # index must stay bit-identical to this operator.
        .filter(F.col("cos").isNotNull())
        .select("query_id", "neighbor_id", "cos")
    )
    return _rank_topk(scored, k)


def plane_coefficients(planes: int, dims: int, seed: str = "rp") -> list[list[float]]:
    """The EXACT hyperplane matrix random_hyperplane_buckets evaluates,
    computed driver-side: coefficient[p][d] = (hash60(f"{seed}:{p}:{d}")
    % 2000001) / 1e6 − 1. Same md5 math as the Spark expression, so an
    external engine (the DuckDB oracle) can reproduce bucket ids
    bit-for-bit from these literals."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:15], 16) % 2000001)
            / 1e6
            - 1.0
            for d in range(dims)
        ]
        for p in range(planes)
    ]


def knn_graph(
    vectors: DataFrame,
    k: int = 5,
    planes: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN graph: for EVERY vector, its top-k cosine
    neighbors among vectors sharing its LSH bucket — the all-nodes twin
    of :func:`lsh_topk` (near-dup clustering, diversity sampling, and
    graph-based curation all start from this edge list).

    Scale shape: bucket once (pure column expressions), then the
    block-pair grid (:func:`block_pair_replicate`): each bucket's
    ≤block² candidate grid is scored with one numpy matrix product per
    Arrow task, which emits its LOCAL top-k per node; a final
    PARTITIONED window (compiles to WindowGroupLimit) re-ranks the ≤
    k·blocks survivors per node. Exact under the (rounded cos desc, id
    asc) total order: a node's global top-k is contained in the union
    of its per-block top-k's. Pairs SCORED are O(Σ bucket²), never
    corpus², with no joined-row materialization — ``planes`` tunes
    bucket occupancy (≈ n/2^planes). Deterministic: hash-derived
    hyperplanes, rounded scores, id tie-breaks. Agreement with the
    sequential-fold ANSI-SQL oracle is EMPIRICAL, not structural: the
    task computes cosine as unit(a)·unit(b) in BLAS accumulation
    order while the oracle folds dot(a,b)/(|a||b|) sequentially, so
    the pre-rounding doubles can differ in the last ulps and a
    round-then-rank could in principle flip at a 1e-6 bin boundary —
    hash-verified at every tested scale factor (sf0.001/0.01/0.1/1),
    collision risk ~1e-12 per pair.
    """
    first_v = vectors.select(CF.as_double_array(vec_col)).first()
    dims = len(first_v[0]) if first_v and first_v[0] is not None else None
    # NULL-embedding rows would all land in bucket 0 and hand out k
    # NULL-cos edges each, silently distorting every graph metric built
    # on these edges — vectorless rows are not graph nodes. NULL ids
    # could never pair under the former join (id != id' evaluates
    # NULL) — dropped up front, before numpy would mishandle them.
    # Off-width vectors do NOT get a NULL bucket: the plan-time
    # coefficient matrix zip_withs to NULL elements, the projection
    # goes NULL, and each bit's .otherwise(lit(0)) maps it to 0 — they
    # land in bucket 0 alongside genuine all-negative-projection rows.
    # size(vec) therefore joins the blocking key (exactly as
    # dedup.embedding_dup_pairs does): cross-dimension pairs drop —
    # the zip_with-fold cosine convention — and every numpy matrix
    # stays rectangular instead of np.vstack raising on ragged input.
    v = (
        clean_vectors(vectors, vec_col)
        .filter(F.col(id_col).isNotNull())
        .select(
            F.col(id_col).alias("vid"),
            CF.as_double_array(vec_col).alias("vec"),
            random_hyperplane_buckets(vec_col, planes, dims=dims).alias("bkt"),
            F.size(vec_col).alias("_dim"),
        )
    )
    rep = block_pair_replicate(v, ["bkt", "_dim"], "vid", 2048)
    id_t = vectors.schema[id_col].dataType.simpleString()
    kk = int(k)

    def _local_topk(key, pdf):
        # key = (bkt, _dim, ci, cj)
        import numpy as np
        import pandas as pd

        diag = key[2] == key[3]
        a = pdf[pdf["role"] == 0]
        b = a if diag else pdf[pdf["role"] == 1]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame(
                {"src": a["vid"][:0], "dst": a["vid"][:0], "cos": []}
            )
        ua = _unit_rows(np.vstack(a["vec"].to_numpy()).astype(np.float64))
        ub = ua if diag else _unit_rows(
            np.vstack(b["vec"].to_numpy()).astype(np.float64)
        )
        # round-then-rank, the exact round_det arithmetic
        c = np.floor((ua @ ub.T) * 1e6 + 0.5) / 1e6
        ia, ib = a["vid"].to_numpy(), b["vid"].to_numpy()
        # the join form's id != id' exclusion (covers self-pairs AND
        # duplicate-id row pairs)
        c[ia[:, None] == ib[None, :]] = -np.inf

        def side(src_ids, dst_ids, cm):
            # local top-k per src under (cos desc, dst asc): order
            # candidates by dst once, then a stable sort on -cos keeps
            # dst-ascending among ties — the _rank_topk total order
            order = np.argsort(dst_ids, kind="stable")
            cm = cm[:, order]
            dsts = dst_ids[order]
            top = np.argsort(-cm, axis=1, kind="stable")[:, :kk]
            vals = np.take_along_axis(cm, top, axis=1).ravel()
            keep = np.isfinite(vals)  # excluded ids sort last as -inf
            return pd.DataFrame(
                {
                    "src": np.repeat(src_ids, top.shape[1])[keep],
                    "dst": dsts[top.ravel()][keep],
                    "cos": vals[keep],
                }
            )

        frames = [side(ia, ib, c)]
        if not diag:
            frames.append(side(ib, ia, c.T))
        return pd.concat(frames, ignore_index=True)

    scored = rep.groupBy("bkt", "_dim", "ci", "cj").applyInPandas(
        _local_topk, f"src {id_t}, dst {id_t}, cos double"
    )
    return _rank_topk(scored, k, part_col="src", id_col="dst")


def _auto_cells(
    n: int, rows_per_cell: int = 512, lo: int = 4, hi: int = 1024
) -> int:
    """Corpus-adaptive IVF cell count: the nearest power of two to
    n/512, clamped to [4, 1024]. The r9 sf1 sweep showed why a FIXED
    cell count cannot serve a serving path: 32 cells starve a 500-row
    corpus (15 rows/cell → recall 0.28) while 8 cells give a 20k
    corpus needlessly coarse pruning granularity. ~512 rows/cell keeps
    every probed cell populated well past k (FAISS practice: cells
    grow with corpus size)."""
    import math

    if n <= 0:
        return lo
    return max(lo, min(hi, 1 << round(math.log2(max(n / rows_per_cell, 1)))))


def _auto_nprobe(n_cells: int) -> int:
    """Floor-holding probe default: max(3, n_cells // 2) — a ~50–75%
    scan. Deliberately conservative, and the r9 sweep says WHY: the
    first sweep drew its recall queries from the quantizer's own
    xxhash-ordered TRAINING sample (the centroids are literally seeded
    from those rows) and measured 0.88 at a 9% scan; held-out queries
    measure 0.26 at the same config. On this isotropic synthetic
    corpus, honest out-of-sample recall tracks the SCANNED FRACTION
    (held-out curve in SWEEP_ann_r09.json: ~0.43 at 25%, ~0.75–0.83 at
    50%, ~0.95 at 75%) — with no cluster structure, IVF cannot beat
    the scan fraction, information-theoretically. Real embedding
    corpora ARE clustered, which is when nprobe can be tuned far below
    cells/2 — against the recall twin, per corpus, never assumed."""
    return max(3, n_cells // 2)


def resolve_n_cells(vectors: DataFrame, n_cells, vec_col: str) -> int:
    """``n_cells='auto'`` → :func:`_auto_cells` over the clean-vector
    count (one count job — the IVF builders already run driver-side
    training collects, so this does not change their eagerness class);
    an int passes through."""
    if n_cells != "auto":
        return int(n_cells)
    return _auto_cells(clean_vectors(vectors, vec_col).count())


def resolve_nprobe(nprobe, n_cells: int) -> int:
    """``nprobe='auto'`` → :func:`_auto_nprobe`; an int passes
    through; always capped at ``n_cells``."""
    p = _auto_nprobe(n_cells) if nprobe == "auto" else int(nprobe)
    return max(1, min(p, n_cells))


def _train_sample(
    vectors: DataFrame,
    sample: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """THE quantizer training sample: the ``sample`` clean rows with
    the smallest ``xxhash64(id)`` — a uniform, order-stable draw that
    needs only a TakeOrdered (no full shuffle) at any corpus size.
    One definition shared by the IVF and PQ trainers so composites
    (ivf_pq_topk) collect it ONCE and hand the same rows to both
    (previously each trainer re-ran the identical TakeOrdered+collect
    — one full corpus pass per trainer)."""
    return (
        # NULL vectors cannot train a quantizer and make np.array
        # ragged (ValueError) — excluded from the sample
        clean_vectors(vectors, vec_col)
        .select(F.col(id_col).alias("_id"), CF.as_double_array(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col("_id")), F.col("_id"))
        .limit(sample)
        .collect()
    )


def ivf_coarse_centroids(
    vectors: DataFrame,
    n_cells: int = 16,
    iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: "list | None" = None,
):
    """Train an IVF coarse quantizer: spherical k-means on a
    deterministic corpus sample. Returns an (n_cells × dim) float64
    ndarray of L2-normalised centroids.

    The sample is the ``sample`` rows with the smallest
    ``xxhash64(id)`` — a uniform, order-stable draw that needs only a
    TakeOrdered (no full shuffle) at any corpus size. Training runs on
    the driver (standard IVF practice: the quantizer sees a sample,
    the full corpus only gets assigned); empty cells keep their
    previous centroid so the cell count is stable.
    """
    import numpy as np

    rows = sample_rows if sample_rows is not None else _train_sample(
        vectors, sample, id_col, vec_col
    )
    if not rows:
        raise ValueError("ivf_coarse_centroids: no vectors to train on")
    # a mixed-width corpus makes np.array ragged (ValueError): the
    # quantizer trains on the sample's MAJORITY width — off-width
    # vectors drop here and at assignment (the cross-dimension-pairs-
    # drop convention; ties break to the smaller width)
    dim = _majority_dim((r["_v"] for r in rows), stage="ivf_coarse_centroids")
    X = np.array([r["_v"] for r in rows if len(r["_v"]) == dim], dtype=np.float64)
    X = _unit_rows(X)
    C = X[: min(n_cells, len(X))].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[c] = m / n
    return C


def ivf_assign_cells(
    df: DataFrame,
    centroids_arr,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Tag every row with its nearest coarse-centroid id (cosine).

    One Arrow-batched matmul per partition — the closure broadcasts the
    (n_cells × dim) matrix, so at 100 TB this is a narrow map stage with
    no shuffle; ties break to the lowest cell id (argmax-first).
    """
    import numpy as np

    Cn = np.asarray(centroids_arr, dtype=np.float64)
    schema = df.withColumn(out_col, F.lit(0)).schema
    dropped = _track_drops(df, "ivf_assign_cells")

    def assign(batches):
        import numpy as np_

        for pdf in batches:
            if pdf.empty:
                continue
            # NULL vectors make np.array ragged (ValueError kills the
            # task and, via build_ivf_index, the whole index build) —
            # a vectorless row cannot be assigned a cell: dropped.
            # Off-width vectors (vs the trained quantizer) are the
            # same ragged crash: they cannot live in ANY cell — dropped.
            # NULL ELEMENTS are subtler: Arrow hands them to pandas as
            # NaN (an `x is None` check is DEAD here), the nan row's
            # argmax lands on a real cell, and the poisoned vector
            # serves as a normal-looking neighbor — dropped here, the
            # choke point every caller shares (data NaNs drop with
            # them: a non-finite vector cannot be anyone's neighbor).
            # Drops COUNT into DROP_COUNTERS["ivf_assign_cells"] so a
            # mixed-width corpus losing half its index is visible.
            n_in = len(pdf)
            pdf = pdf[pdf["_dvec"].notna()]
            pdf = pdf[pdf["_dvec"].map(
                lambda a: len(a) == Cn.shape[1]
                and not np_.isnan(
                    np_.asarray(a, dtype=np_.float64)
                ).any()
            )]
            if n_in - len(pdf):
                dropped.add(n_in - len(pdf))
            if pdf.empty:
                continue
            V = np_.array(list(pdf["_dvec"]), dtype=np_.float64)
            # zero-norm rows → zero vector (cos 0 everywhere), the
            # _unit_rows rule — a bare divide yields a NaN row whose
            # argmax silently lands on cell 0 and whose query-time
            # cosine is NaN (ranked FIRST by desc)
            nrm = np_.linalg.norm(V, axis=1, keepdims=True)
            V /= np_.where(nrm == 0, 1.0, nrm)
            out = pdf.drop(columns=["_dvec"])
            out[out_col] = (V @ Cn.T).argmax(axis=1).astype("int32")
            yield out

    with_d = df.withColumn("_dvec", CF.as_double_array(vec_col))
    return with_d.mapInPandas(assign, schema)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells="auto",
    nprobe="auto",
    iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: train a coarse quantizer, partition the
    corpus into cells, and search only each query's ``nprobe`` nearest
    cells.

    The scale shape: corpus assignment is a narrow map (no shuffle);
    the probe is a broadcast equi-join on cell id, so the scan touches
    ~nprobe/n_cells of the corpus. Scoring reuses the deterministic
    JVM-side cosine fold + rounded ranking, so results are reproducible
    run-to-run (approximate vs. brute force by design → rows-only
    oracle; recall pinned by unit tests).

    ``n_cells`` defaults to ``'auto'`` (:func:`_auto_cells`, ~512
    rows/cell — no fixed count serves both a 500-row and a 20k
    corpus) and ``nprobe`` to ``'auto'`` (:func:`_auto_nprobe`,
    max(3, cells/2)) — the floor-holding default the HELD-OUT sf1
    sweep forced; read _auto_nprobe's docstring for the
    train/test-contamination story and why structureless data pins
    recall to the scanned fraction.
    """
    import numpy as np

    n_cells = resolve_n_cells(vectors, n_cells, vec_col)
    nprobe = resolve_nprobe(nprobe, n_cells)
    C = ivf_coarse_centroids(
        vectors, n_cells=n_cells, iters=iters, sample=sample, id_col=id_col, vec_col=vec_col
    )
    v = ivf_assign_cells(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
        C,
        vec_col=vec_col,
    ).select("neighbor_id", CF.as_double_array(vec_col).alias("vec"), "cell")

    qid_t = _id_type(queries, query_id_col)
    # dirty query rows (NULL id / NULL vector / NULL element /
    # off-width vs the trained quantizer) score nothing instead of
    # crashing the numpy batch (ragged or object-dtype np.array)
    q_rows = [
        r
        for r in queries.select(
            F.col(query_id_col).alias("query_id"),
            CF.as_double_array(vec_col).alias("qvec"),
        ).collect()
        if r["query_id"] is not None
        and r["qvec"] is not None
        and not any(x is None for x in r["qvec"])
        and len(r["qvec"]) == C.shape[1]
    ]
    if not q_rows:
        return _empty_topk(
            vectors.sparkSession, qid_t=qid_t, nid_t=_id_type(vectors, id_col)
        )
    Q = np.array([r["qvec"] for r in q_rows], dtype=np.float64)
    Qn = _unit_rows(Q)
    probe_cells = np.argsort(-(Qn @ C.T), axis=1, kind="stable")[:, : max(nprobe, 1)]
    probe = [
        (r["query_id"], r["qvec"], int(c))
        for r, cells in zip(q_rows, probe_cells)
        for c in cells
    ]
    spark = vectors.sparkSession
    q = spark.createDataFrame(probe, f"query_id {qid_t}, qvec array<double>, cell int")

    scored = (
        v.join(F.broadcast(q), ["cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", CF.round_det(CF.cosine(F.col("vec"), F.col("qvec")), 6))
        # assignment already width/NULL-gates the corpus and the query
        # list is width-filtered, so a NULL cosine should be impossible
        # — the drop is cheap insurance mirroring lsh_topk (a NULL-cos
        # edge must never pad a sparse cell's top-k)
        .filter(F.col("cos").isNotNull())
        .select("query_id", "neighbor_id", "cos")
    )
    return _rank_topk(scored, k)


def ivf_recall_curve(
    vectors: DataFrame,
    k: int = 10,
    n_cells="auto",
    n_queries: int = 32,
    iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> list:
    """Exact held-out recall@k of IVF probing at EVERY probe depth,
    from ONE Spark job (r9 verdict #1's measurement primitive).

    Train the coarse quantizer once, then score the held-out query set
    against the whole assigned corpus keeping only the per-(query,
    cell) top-k — a WindowGroupLimit, so n_queries·n_cells·k rows reach
    the driver, never the corpus. That per-cell top-k is a SUFFICIENT
    statistic: any candidate in the top-k of an nprobe-prefix is
    necessarily in the top-k of its OWN cell (every same-cell candidate
    is inside the same prefix), so a driver-side prefix scan reads off
    exact recall at every nprobe — including nprobe = n_cells, which IS
    the brute-force truth under the shared rounded-cosine + id
    tie-break order.

    Queries are the ``n_queries`` LARGEST-xxhash64 clean vectors —
    provably disjoint from the quantizer's smallest-xxhash64 training
    sample (the r9 train/test-contamination lesson, SWEEP_ann_r09:
    training-head queries over-measured recall 0.88 vs 0.26 held-out).
    """
    import numpy as np

    if centroids is not None:
        # measure an ALREADY-TRAINED quantizer (the index-build path
        # calibrates the centroids it is about to persist — training a
        # second quantizer here would measure a different model)
        C = np.asarray(centroids, dtype=np.float64)
        n_cells = C.shape[0]
    else:
        n_cells = resolve_n_cells(vectors, n_cells, vec_col)
        C = ivf_coarse_centroids(
            vectors, n_cells=n_cells, iters=iters, sample=sample,
            id_col=id_col, vec_col=vec_col,
        )
    clean = clean_vectors(vectors, vec_col)
    q_rows = [
        r
        for r in (
            clean.select(
                F.col(id_col).alias("query_id"),
                CF.as_double_array(vec_col).alias("qvec"),
            )
            .orderBy(F.desc(F.xxhash64(F.col("query_id"))), F.col("query_id"))
            .limit(n_queries)
            .collect()
        )
        if r["query_id"] is not None and len(r["qvec"]) == C.shape[1]
    ]
    if not q_rows:
        raise ValueError("ivf_recall_curve: no usable held-out queries")
    Q = _unit_rows(np.array([r["qvec"] for r in q_rows], dtype=np.float64))
    order = np.argsort(-(Q @ C.T), axis=1, kind="stable")
    probe = [
        (r["query_id"], r["qvec"], int(c), int(pos))
        for r, cells in zip(q_rows, order)
        for pos, c in enumerate(cells)
    ]
    spark = vectors.sparkSession
    qid_t = _id_type(vectors, id_col)
    qdf = spark.createDataFrame(
        probe, f"query_id {qid_t}, qvec array<double>, cell int, cell_rank int"
    )
    v = ivf_assign_cells(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
        C,
        vec_col=vec_col,
    ).select("neighbor_id", CF.as_double_array(vec_col).alias("vec"), "cell")
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id", "cell_rank").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    per_cell = (
        v.join(F.broadcast(qdf), ["cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", CF.round_det(CF.cosine(F.col("vec"), F.col("qvec")), 6))
        .filter(F.col("cos").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "cell_rank")
        .collect()
    )
    by_q: dict = {}
    for r in per_cell:
        by_q.setdefault(r["query_id"], []).append(
            (r["cell_rank"], -r["cos"], r["neighbor_id"])
        )

    def _topk(rows, p):
        elig = sorted(
            (t for t in rows if t[0] < p), key=lambda t: (t[1], t[2])
        )
        return {t[2] for t in elig[:k]}

    truth = {q: _topk(rows, n_cells) for q, rows in by_q.items()}
    curve = []
    for p in range(1, n_cells + 1):
        hits = tot = 0
        for q, rows in by_q.items():
            want = truth[q]
            tot += len(want)
            hits += len(want & _topk(rows, p))
        curve.append(
            {
                "n_cells": n_cells,
                "nprobe": p,
                "scan_frac": round(p / n_cells, 4),
                "recall_at_k": round(hits / tot, 4) if tot else 0.0,
            }
        )
    return curve


def calibrate_nprobe(
    vectors: DataFrame,
    target_recall: float = 0.8,
    k: int = 10,
    n_cells="auto",
    n_queries: int = 32,
    iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> dict:
    """Measured per-corpus IVF serving config (r9 verdict #1): the
    smallest ``nprobe`` whose HELD-OUT recall@k meets ``target_recall``
    on THIS corpus, read off one :func:`ivf_recall_curve` pass.
    ``centroids`` (optional) calibrates an already-trained quantizer —
    the index-build path passes the centroids it is persisting, so the
    measurement and the served model are the same model.

    The registered default (:func:`_auto_nprobe` = max(3, cells/2))
    stays floor-honest because a STRUCTURELESS corpus pins
    out-of-sample recall to the scanned fraction — on isotropic data
    this helper simply measures that and picks ≈cells/2. On a corpus
    with cluster structure — the realistic embedding case — the same
    recall floor is reached at a small fraction of the scan, and this
    MEASUREMENT (never an assumption) is what licenses a serving
    config below the floor default. SWEEP_ann_r10.json carries both
    regimes side by side.

    Returns the picked point plus ``met_target`` (False → the pick is
    the full-scan end of the curve: serve brute-force or restructure)
    and the whole ``curve`` for the dashboard."""
    curve = ivf_recall_curve(
        vectors, k=k, n_cells=n_cells, n_queries=n_queries, iters=iters,
        sample=sample, id_col=id_col, vec_col=vec_col, centroids=centroids,
    )
    ok = [pt for pt in curve if pt["recall_at_k"] >= target_recall]
    pick = min(ok, key=lambda pt: pt["nprobe"]) if ok else curve[-1]
    return {
        **pick,
        "target_recall": target_recall,
        "met_target": bool(ok),
        "curve": curve,
    }


def centroids(
    df: DataFrame, group_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-group centroid, long format (group, dim, centroid).

    posexplode + groupBy(group, dim) — partial avg map-side; at 100 TB
    this is one shuffle of (groups × dims) rows.
    """
    return (
        df.select(F.col(group_col).alias("grp"), F.posexplode(CF.as_double_array(vec_col)))
        .groupBy("grp", "pos")
        .agg(_dim_mean(F.col("col")).alias("centroid"))
        .select(F.col("grp").alias(group_col), (F.col("pos") + 1).alias("dim"), "centroid")
    )


# ------------------------------------------------ product quantization


def _pq_subspace_dots(Xj, C):
    """x·c for one PQ subspace as an explicit per-dimension
    broadcast-multiply accumulation instead of a dgemm.

    PQ subspaces are THIN (dsub = dim/m, typically 2–8): this
    platform's BLAS runs a (n×4)@(4×k) dgemm ~5× slower than the
    equivalent elementwise ops (2000×4@4×256 measured 14.9 ms vs
    2.8 ms — dgemm packing overhead dwarfs the 2M flops; a (n×64)
    gemm with 16× the flops takes 4.9 ms). The accumulation here is
    the same sequential d-loop a thin dgemm performs, and the dot
    values measured BIT-IDENTICAL to the matmul on the shipped
    corpora — pinned end-to-end by test_pq_fast_assign against the
    textbook reference. The IVF paths keep their matmuls: dim=64
    inner is past the pathology."""
    import numpy as np

    acc = np.multiply(Xj[:, 0, None], C[None, :, 0])
    for d in range(1, Xj.shape[1]):
        acc += Xj[:, d, None] * C[None, :, d]
    return acc


def pq_train_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 8,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: "list | None" = None,
):
    """Train product-quantization codebooks (Jégou et al. 2011): split
    the (L2-normalised) vector into ``m`` subspaces and run plain
    k-means with ``k`` centroids in each, on the same deterministic
    smallest-xxhash64 corpus sample the IVF quantizer uses. Returns an
    (m × k × dim/m) float64 ndarray.

    Training is driver-side over the sample (standard PQ practice);
    only encoding touches the full corpus.
    """
    import numpy as np

    rows = sample_rows if sample_rows is not None else _train_sample(
        vectors, sample, id_col, vec_col
    )
    if not rows:
        raise ValueError("pq_train_codebooks: no vectors to train on")
    # majority-width training, exactly as ivf_coarse_centroids: a
    # mixed-width sample must not ValueError the whole job
    dim = _majority_dim((r["_v"] for r in rows), stage="pq_train_codebooks")
    X = np.array([r["_v"] for r in rows if len(r["_v"]) == dim], dtype=np.float64)
    X = _unit_rows(X)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.zeros((m, min(k, len(X)), dsub))
    for j in range(m):
        Xj = X[:, j * dsub : (j + 1) * dsub]
        C = Xj[: books.shape[1]].copy()
        for _ in range(iters):
            # argmin over ||x−c||² = argmin over (||c||² − 2x·c): the
            # per-row ||x||² term is constant within a row and cannot
            # change which centroid wins, so the assignment step runs
            # as one small matmul instead of materialising the
            # (n × k × dsub) broadcast-subtract cube — this was 60% of
            # the registered PQ queries' wall time (driver-side, guide
            # §5). Codebooks come out BIT-IDENTICAL on the shipped
            # corpora (verified old-vs-new at sf0.001/0.01/0.1): the
            # winner only differs if two DISTINCT centroids are
            # equidistant to ~1e-14, and the centroid UPDATE below is
            # untouched (same members, same mean arithmetic). Exact
            # duplicate centroids still tie identically (equal inputs
            # → equal matmul columns → argmin picks the first).
            assign = (
                (C * C).sum(axis=1)[None, :]
                - 2.0 * _pq_subspace_dots(Xj, C)
            ).argmin(axis=1)
            if dsub > 1:
                # vectorized centroid update (r11): np.add.at
                # accumulates each group's members SEQUENTIALLY in
                # original row order — exactly the order and pairing
                # numpy's axis-0 mean uses for a 2-D (row-strided)
                # reduce — so sums/counts here are BIT-IDENTICAL to
                # the r10 per-group mean loop (pinned against the
                # verbatim textbook reference in test_pq_fast_assign,
                # and by the grouped-mean equivalence test). This
                # removes the k-iteration Python loop that was ~all of
                # the remaining training wall (k=256 × m × iters calls).
                # Empty groups keep their previous centroid, as before.
                sums = np.zeros_like(C)
                cnt = np.zeros(len(C))
                np.add.at(sums, assign, Xj)
                np.add.at(cnt, assign, 1.0)
                nz = cnt > 0
                C[nz] = sums[nz] / cnt[nz, None]
            else:
                # dsub == 1: a group's members form a CONTIGUOUS column
                # and numpy's 1-D mean switches to pairwise summation,
                # which does NOT match add.at's sequential order — keep
                # the bit-exact grouped-mean loop for that (rare m=dim)
                # configuration. 'stable' keeps each group's rows in
                # original order → bit-identical centroids.
                order = np.argsort(assign, kind="stable")
                bounds = np.searchsorted(
                    assign[order], np.arange(len(C) + 1)
                )
                for c in range(len(C)):
                    s, e = bounds[c], bounds[c + 1]
                    if e > s:
                        C[c] = Xj[order[s:e]].mean(axis=0)
        books[j] = C
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    out_col: str = "code",
) -> DataFrame:
    """Encode every vector as ``m`` small centroid ids (array<int>).

    Narrow Arrow-batched map — the codebooks ride the closure, nothing
    shuffles; at 100 TB the sink holds m·log2(k) bits per vector
    (4 bytes at m=8,k=16) instead of dim·4 float bytes: the memory step
    that makes billion-scale ANN fit executor RAM.
    """
    import numpy as np

    B = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = B.shape
    keep = [f.name for f in df.schema.fields if f.name != vec_col]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name != vec_col]
        + [f"{out_col} array<int>"]
    )

    dropped = _track_drops(df, "pq_encode")

    def enc(batches):
        import numpy as np_

        for pdf in batches:
            if pdf.empty:
                continue
            # NULL vectors make np.array ragged (ValueError kills the
            # task) — a vectorless row cannot be encoded: dropped.
            # Off-width vectors (vs the trained codebooks) likewise.
            # NULL elements arrive from Arrow as NaN (not None) and
            # would encode into a normal-looking code from garbage nan
            # subdistances — dropped at this shared choke point.
            # Drops COUNT into DROP_COUNTERS["pq_encode"] (r8 ADVICE).
            n_in = len(pdf)
            pdf = pdf[pdf["_dvec"].notna()]
            pdf = pdf[pdf["_dvec"].map(
                lambda a: len(a) == m * dsub
                and not np_.isnan(
                    np_.asarray(a, dtype=np_.float64)
                ).any()
            )]
            if n_in - len(pdf):
                dropped.add(n_in - len(pdf))
            if pdf.empty:
                continue
            V = np_.array(list(pdf["_dvec"]), dtype=np_.float64)
            # zero-norm rows → zero vector (the _unit_rows rule), not
            # a NaN row that would poison every subquantizer distance
            nrm = np_.linalg.norm(V, axis=1, keepdims=True)
            V /= np_.where(nrm == 0, 1.0, nrm)
            codes = np_.empty((len(V), m), dtype=np_.int32)
            for j in range(m):
                Vj = V[:, j * dsub : (j + 1) * dsub]
                # matmul-form argmin (||c||² − 2v·c, the per-row ||v||²
                # constant dropped) — same assignment rule as training,
                # without the (n × k × dsub) broadcast-subtract cube per
                # batch; the dot runs as the thin-subspace broadcast
                # accumulation (_pq_subspace_dots — the dgemm is ~5×
                # slower at dsub-wide inner dims and the values measured
                # bit-identical); codes verified bit-identical on the
                # shipped corpora (see pq_train_codebooks)
                dots = _pq_subspace_dots(Vj, B[j])
                codes[:, j] = (
                    (B[j] * B[j]).sum(axis=1)[None, :] - 2.0 * dots
                ).argmin(axis=1)
            out = pdf[keep].copy()
            out[out_col] = list(codes)
            yield out

    return df.withColumn("_dvec", CF.as_double_array(vec_col)).drop(vec_col).mapInPandas(
        enc, schema
    )


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_centroids: int = 16,
    iters: int = 8,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    refine: int = 0,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: corpus stored as codes, each
    query carries a flattened (m·k) lookup table of exact
    query-to-centroid squared distances, and the scan scores a code by
    summing m table lookups — a JVM-side `aggregate` over the code
    array, no Python and no full-dimension math in the hot path.

    On normalised vectors L2² = 2−2·cos, so ADC ascending ≈ cosine
    descending. With ``refine`` > 0 the ADC pass keeps a
    ``refine``×k shortlist per query and re-ranks it with the exact
    cosine on the full vectors (the standard ADC+refine production
    shape: the compressed scan prunes the corpus, the expensive math
    touches only the shortlist — a broadcast-able id semi-join at any
    corpus size). Approximate by design → rows-only oracle, recall
    pinned by tests/test_pq.py.

    SCHEMA DIFFERS BY MODE, deliberately: ``refine > 0`` returns
    (query_id, neighbor_id, cos) like every sibling *_topk (cos
    descending = better); ``refine = 0`` returns
    (query_id, neighbor_id, adc_d2) where SMALLER is better — ADC
    squared distances are not cosines and presenting them under a
    ``cos`` column would silently invert any generic
    higher-is-better consumer. Select the column by name.
    """
    import numpy as np

    B = pq_train_codebooks(
        vectors, m=m, k=n_centroids, iters=iters, sample=sample, id_col=id_col, vec_col=vec_col
    )
    mm, kk, dsub = B.shape
    enc = pq_encode(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)), B, vec_col=vec_col
    )

    qid_t = _id_type(queries, query_id_col)
    # dirty query rows (NULL id / NULL vector / NULL element /
    # off-width vs the trained codebooks) score nothing instead of
    # crashing the numpy batch (ragged or object-dtype np.array)
    q_rows = [
        r
        for r in queries.select(
            F.col(query_id_col).alias("query_id"),
            CF.as_double_array(vec_col).alias("qvec"),
        ).collect()
        if r["query_id"] is not None
        and r["qvec"] is not None
        and not any(x is None for x in r["qvec"])
        and len(r["qvec"]) == mm * dsub
    ]
    if not q_rows:
        return _empty_topk(
            vectors.sparkSession,
            "adc_d2" if not refine else "cos",
            qid_t=qid_t,
            nid_t=_id_type(vectors, id_col),
        )
    Q = np.array([r["qvec"] for r in q_rows], dtype=np.float64)
    Q = _unit_rows(Q)
    luts = []
    for r, qv in zip(q_rows, Q):
        lut = np.empty(mm * kk)
        for j in range(mm):
            qj = qv[j * dsub : (j + 1) * dsub]
            lut[j * kk : (j + 1) * kk] = ((B[j] - qj[None, :]) ** 2).sum(axis=1)
        luts.append((r["query_id"], [round(float(x), 9) for x in lut]))
    spark = vectors.sparkSession
    q = spark.createDataFrame(luts, f"query_id {qid_t}, lut array<double>")

    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(mm - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(F.col("lut"), j * kk + F.element_at(F.col("code"), j + 1) + 1),
    )
    scored = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc_d2", CF.round_det(adc, 6))
        .select("query_id", "neighbor_id", "adc_d2")
    )
    shortlist = _rank_topk(
        scored, k * refine if refine else k,
        score_col="adc_d2", ascending=True,
    )
    if not refine:
        return shortlist

    qv = spark.createDataFrame(
        [(r["query_id"], [float(x) for x in q]) for r, q in zip(q_rows, Q)],
        f"query_id {qid_t}, qvec array<double>",
    )
    full = vectors.select(
        F.col(id_col).alias("neighbor_id"), CF.as_double_array(vec_col).alias("vec")
    )
    reranked = (
        # the shortlist is at most |queries|*k*refine rows: broadcast
        # it so the rerank is a map over the corpus scan, not a
        # corpus-wide shuffle (the cost PQ compression exists to avoid)
        F.broadcast(shortlist).join(full, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cos", CF.round_det(CF.cosine(F.col("vec"), F.col("qvec")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    return _rank_topk(reranked, k)


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells="auto",
    nprobe="auto",
    m: int = 8,
    n_centroids: int = 256,
    refine: int = 10,
    iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ top-k — the billion-scale composite (FAISS IVFPQ shape):
    the coarse quantizer prunes the corpus to each query's ``nprobe``
    nearest cells, PQ codes score ONLY those survivors in the
    compressed domain (the same JVM-side ADC lookup-table aggregate as
    :func:`pq_topk`), and the exact cosine re-ranks the ``refine``×k
    shortlist. :func:`ivf_topk` bounds scan VOLUME but pays full-dim
    math per survivor; :func:`pq_topk` compresses the math but scans
    every code; this pays neither — scanned fraction ~nprobe/n_cells
    AND bytes/vector ~m·log2(n_centroids)/8, which is what serves
    1e9+ vectors from executor RAM.

    Codes quantize RAW vectors (IVF prunes, PQ compresses —
    independent codebooks, not per-cell residual codebooks; the
    residual variant buys recall at equal bits but couples the
    quantizers, and the twin-measured recall here already clears the
    production floor). Deterministic: both quantizers train on the
    same smallest-xxhash64 sample, majority-width rule, and every
    ranking orders by (rounded score, id). Approximate by design →
    rows-only oracle; recall twin in scripts/twins.py.

    ``n_cells='auto'`` / ``nprobe='auto'`` follow the same rules as
    :func:`ivf_topk` (recall here is bounded by the coarse probe; the
    PQ stage loses nothing further at 8-bit resolution).
    """
    import numpy as np

    n_cells = resolve_n_cells(vectors, n_cells, vec_col)
    nprobe = resolve_nprobe(nprobe, n_cells)
    # both quantizers train on the SAME smallest-xxhash64 sample by
    # construction — collect it once and hand the rows to both (each
    # trainer used to re-run the identical TakeOrdered+collect: two
    # full corpus passes for one sample)
    srows = _train_sample(vectors, sample, id_col, vec_col)
    C = ivf_coarse_centroids(
        vectors, n_cells=n_cells, iters=iters, sample=sample,
        id_col=id_col, vec_col=vec_col, sample_rows=srows,
    )
    B = pq_train_codebooks(
        vectors, m=m, k=n_centroids, iters=iters, sample=sample,
        id_col=id_col, vec_col=vec_col, sample_rows=srows,
    )
    mm, kk_cb, dsub = B.shape
    if C.shape[1] != mm * dsub:
        # both train on the same sample under the same majority-width
        # rule, so a mismatch means the caller's m doesn't divide the
        # corpus width — surface it before garbage LUT math does
        raise ValueError(
            f"ivf_pq_topk: coarse dim {C.shape[1]} != m*dsub {mm * dsub}"
        )
    enc = pq_encode(
        ivf_assign_cells(
            vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
            C,
            vec_col=vec_col,
        ),
        B,
        vec_col=vec_col,
    )

    qid_t = _id_type(queries, query_id_col)
    q_rows = [
        r
        for r in queries.select(
            F.col(query_id_col).alias("query_id"),
            CF.as_double_array(vec_col).alias("qvec"),
        ).collect()
        if r["query_id"] is not None
        and r["qvec"] is not None
        and not any(x is None for x in r["qvec"])
        and len(r["qvec"]) == C.shape[1]
    ]
    if not q_rows:
        return _empty_topk(
            vectors.sparkSession, qid_t=qid_t, nid_t=_id_type(vectors, id_col)
        )
    Q = _unit_rows(np.array([r["qvec"] for r in q_rows], dtype=np.float64))
    probe_cells = np.argsort(-(Q @ C.T), axis=1, kind="stable")[:, : max(nprobe, 1)]
    probe = []
    for r, qv, cells in zip(q_rows, Q, probe_cells):
        lut = np.empty(mm * kk_cb)
        for j in range(mm):
            qj = qv[j * dsub : (j + 1) * dsub]
            lut[j * kk_cb : (j + 1) * kk_cb] = (
                (B[j] - qj[None, :]) ** 2
            ).sum(axis=1)
        lut_list = [round(float(x), 9) for x in lut]
        for c in cells:
            probe.append((r["query_id"], lut_list, int(c)))
    spark = vectors.sparkSession
    q = spark.createDataFrame(
        probe, f"query_id {qid_t}, lut array<double>, cell int"
    )

    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(mm - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.col("lut"), j * kk_cb + F.element_at(F.col("code"), j + 1) + 1
        ),
    )
    scored = (
        enc.join(F.broadcast(q), ["cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc_d2", CF.round_det(adc, 6))
        .select("query_id", "neighbor_id", "adc_d2")
    )
    shortlist = _rank_topk(
        scored, k * max(refine, 1), score_col="adc_d2", ascending=True
    )
    qv_frame = spark.createDataFrame(
        [(r["query_id"], [float(x) for x in qv]) for r, qv in zip(q_rows, Q)],
        f"query_id {qid_t}, qvec array<double>",
    )
    full = vectors.select(
        F.col(id_col).alias("neighbor_id"), CF.as_double_array(vec_col).alias("vec")
    )
    reranked = (
        F.broadcast(shortlist).join(full, "neighbor_id")
        .join(F.broadcast(qv_frame), "query_id")
        .withColumn("cos", CF.round_det(CF.cosine(F.col("vec"), F.col("qvec")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    return _rank_topk(reranked, k)


def centroid_arrays(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """Per-group centroid as an ORDERED array<double> (one row per
    group, broadcastable): posexplode → per-(group,dim) partial avg →
    dim-sorted re-assembly. The per-dim mean is rounded so the vector
    is engine-identical before any downstream dot product."""
    long = df.select(
        group_col, F.posexplode(CF.as_double_array(vec_col)).alias("dim", "val")
    )
    cent = long.groupBy(group_col, "dim").agg(
        _dim_mean(F.col("val"), digits).alias("c")
    )
    packed = cent.groupBy(group_col).agg(
        F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("_s")
    )
    return packed.select(
        group_col, F.transform("_s", lambda s: s["c"]).alias("centroid")
    )


def centroid_outliers(
    df: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pct: float = 0.1,
) -> DataFrame:
    """Embedding-space outlier detection: vectors whose cosine to their
    OWN group centroid falls below the group's interpolated ``pct``
    percentile — the "drop the weirdest 10% per class" cleaning gate.

    Scale shape: centroids are a |groups|-row broadcast; scoring is one
    narrow corpus pass; the cutoff is the explicit-rank interpolation
    (≤2 non-zero summands per group → engine-exact), computed under one
    per-group window shuffle. Returns (id, group, cos_c, cutoff) for
    outliers only.

    NULL-embedding rows — including arrays CONTAINING a NULL element,
    which poison the cosine to NULL just the same — are excluded UP
    FRONT: a NULL cosine sorts first in the rank window (taking rn=1),
    its pct_cell term is NULL and F.sum silently drops it — biasing
    the cutoff low for the whole group — and the row itself could
    never be flagged (NULL < cutoff is not true). Vectorless rows are
    an upstream data-quality issue, not embedding-space outliers.

    NULL group labels form their own group (null-safe joins, the
    embedding_dup_pairs convention): a plain name-join would silently
    exempt every unlabeled vector from outlier detection.
    """
    from pyspark.sql.window import Window

    from chillastic_spark.operators.dedup import materialize

    df = clean_vectors(df, vec_col)
    cent = centroid_arrays(df, group_col, vec_col)
    # the scored table feeds BOTH the percentile window and the final
    # filter — materialize it so the centroid join + cosine pass over
    # the corpus runs once (same two-consumer pattern as the dedup
    # shingle tables)
    cent = cent.withColumnRenamed(group_col, "__cg")
    scored = materialize(
        df.join(
            F.broadcast(cent), F.col(group_col).eqNullSafe(F.col("__cg"))
        ).select(
            F.col(id_col),
            F.col(group_col),
            CF.round_det(
                CF.cosine(CF.as_double_array(vec_col), F.col("centroid")), 6
            ).alias("cos_c"),
        )
    )
    wr = Window.partitionBy(group_col).orderBy("cos_c", id_col)
    wn = Window.partitionBy(group_col)
    r = scored.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count("*").over(wn)
    )
    cell = CF.pct_cell(F.col("cos_c"), F.col("rn"), F.col("n"), pct)
    cut = (
        r.filter(CF.pct_keep(F.col("rn"), F.col("n"), pct))
        .groupBy(group_col)
        .agg(CF.round_det(F.sum(cell), 6).alias("cutoff"))
    )
    cut = cut.withColumnRenamed(group_col, "__kg")
    return (
        scored.join(
            F.broadcast(cut), F.col(group_col).eqNullSafe(F.col("__kg"))
        )
        .filter(F.col("cos_c") < F.col("cutoff"))
        .drop("__kg")
    )
