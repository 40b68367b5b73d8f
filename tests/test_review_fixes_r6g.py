"""Regression tests for the round-6 vector/multimodal review:

1. A NULL embedding crashed every numpy-batched path (ragged np.array)
   and polluted the JVM LSH paths with bucket-0 NULL-cos junk edges.
2. centroid_outliers let a NULL cosine take rank 1, silently biasing
   the percentile cutoff low for the whole group.
3. Multimodal output schemas hardcoded doc_id as long — string-id
   callers crashed at the Arrow cast.
4. apply_data_mutators(quarantine=True) let wrong-TYPED envelope
   fields (int _index, str _size) escape the per-record guard and
   kill the whole slice at the batch Arrow cast.
5. audio_features materialized the full overlapping frame matrix
   (covered by the exact-twin gate: values are bit-identical).
"""
import pytest
from pyspark.sql import functions as F


def _vecs(spark, with_null=True):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    if with_null:
        rows.append((99, None))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_null_embedding_rows_score_nothing_everywhere(spark):
    from chillastic_spark.operators import similarity as S

    v = _vecs(spark)
    q = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (7, None), (None, [1.0, 0.0, 0.0, 0.0])],
        "query_id long, embedding array<double>",
    )
    # numpy-batched exact path: no crash, no NULL ids/neighbors
    fast = S.brute_force_topk_fast(v, q, k=2).collect()
    assert all(r.query_id == 1 and r.neighbor_id != 99 for r in fast), fast
    # LSH path: the NULL corpus row is neither a query nor a neighbor
    lsh = S.lsh_topk(v, q, k=2, planes=2).collect()
    assert all(r.neighbor_id != 99 and r.query_id == 1 for r in lsh), lsh
    # knn graph: vectorless rows are not nodes
    g = S.knn_graph(v, k=2, planes=1).collect()
    assert all(r.src != 99 and r.dst != 99 for r in g), g
    # IVF/PQ end-to-end over a corpus containing the NULL row
    ivf = S.ivf_topk(v, q, k=2, n_cells=2).collect()
    assert all(r.neighbor_id != 99 for r in ivf)
    pq = S.pq_topk(v, q, k=2, m=2, n_centroids=4).collect()
    assert all(r.neighbor_id != 99 for r in pq)


def test_centroid_outliers_ignores_null_vectors(spark):
    from chillastic_spark.operators.similarity import centroid_outliers

    rows = [("a", i, [float(i % 3 == 0), 1.0, 0.0]) for i in range(1, 11)]
    rows.append(("a", 99, None))
    df = spark.createDataFrame(rows, "label string, vec_id long, embedding array<double>")
    out = centroid_outliers(df, pct=0.2).collect()
    assert all(r.vec_id != 99 for r in out)
    assert all(r.cos_c is not None and r.cutoff is not None for r in out)
    # same cutoff as running without the NULL row at all
    base = centroid_outliers(
        spark.createDataFrame(rows[:-1], "label string, vec_id long, embedding array<double>"),
        pct=0.2,
    ).collect()
    assert {(r.vec_id, r.cutoff) for r in out} == {(r.vec_id, r.cutoff) for r in base}


def test_multimodal_accepts_string_ids(spark):
    from chillastic_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [("docA", "hello media payload"), ("docB", "another one")],
        "key string, text string",
    )
    p = M.with_binary_payload(df)
    meta = M.decode_media(p, id_col="key", fake=True).collect()
    assert {r.doc_id for r in meta} == {"docA", "docB"}
    feats = M.audio_features(p, id_col="key", fake=True).collect()
    assert {r.doc_id for r in feats} == {"docA", "docB"}
    ph = M.phash_images(p, id_col="key", fake=True).collect()
    assert {r.doc_id for r in ph} == {"docA", "docB"}


def test_quarantine_absorbs_wrong_typed_envelope_fields(spark):
    from chillastic_spark.operators.mutate import QUARANTINE_INDEX, apply_data_mutators
    from chillastic_spark.registry import Mutators

    m = Mutators()
    m.add(
        "badtypes",
        'TYPE = "data"\n'
        "def predicate(doc, args):\n    return doc['_id'] == 'bad'\n"
        "def mutate(doc, args):\n"
        "    doc['_index'] = 20240101\n"  # int index: Arrow cast poison
        "    return doc\n",
    )
    df = spark.createDataFrame(
        [
            ("ix", "d", "bad", '{"x": 1}', None),
            ("ix", "d", "good", '{"x": 2}', None),
        ],
        "_index string, _type string, _id string, _source string, _size long",
    )
    out = apply_data_mutators(df, [m.get("badtypes")], quarantine=True).collect()
    by_index = {}
    for r in out:
        by_index.setdefault(r["_index"], []).append(r)
    assert len(by_index.get(QUARANTINE_INDEX, [])) == 1  # bad doc routed
    assert len(by_index.get("ix", [])) == 1  # good doc survives
