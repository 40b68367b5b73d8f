"""Property test: the distributed Arrow-batched mutator fold
(apply_data_mutators over a DataFrame) must agree row-for-row with the
pure-Python reference fold (mutate_objects) for ARBITRARY document
payloads and predicate/mutate combinations — partitioning, Arrow
batching, and JSON round-tripping through the envelope must never
change the semantics (transfer.js:271-284)."""
import json

from hypothesis import given, settings, strategies as st

from chillastic_spark.operators.mutate import apply_data_mutators, mutate_objects

# JSON-safe payloads: scalars, lists, nested dicts (depth-bounded)
scalars = st.one_of(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.text(max_size=8),
    st.booleans(),
    st.none(),
)
payload = st.recursive(
    scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(st.text(min_size=1, max_size=5), inner, max_size=3),
    ),
    max_leaves=8,
)
docs_strategy = st.lists(
    st.dictionaries(st.text(min_size=1, max_size=5), payload, max_size=4),
    min_size=0,
    max_size=12,
)


class _Mut:
    def __init__(self, pred, mut, args=None):
        self.predicate, self.mutate, self.arguments = pred, mut, args


def _mutators():
    # deterministic chain over ENVELOPE docs (the mutator contract:
    # predicates/mutators see {_index,_type,_id,_source,...}) —
    # exercises pass-through, _source rewrite, reroute, and drop
    tag = _Mut(
        lambda d, a: len(d["_source"]) >= 1,
        lambda d, a: {**d, "_source": {**d["_source"], "__tagged": True}},
    )
    drop_small = _Mut(
        lambda d, a: len(json.dumps(d["_source"], sort_keys=True)) < 8,
        lambda d, a: None,
    )
    reroute = _Mut(
        lambda d, a: "__tagged" in d["_source"],
        lambda d, a: {
            **d,
            "_index": d["_index"] + "_v2",
            "_source": {
                k: v for k, v in d["_source"].items() if k != "__tagged"
            }
            | {"t": 1},
        },
    )
    return [tag, drop_small, reroute]


@settings(max_examples=15, deadline=None)
@given(docs=docs_strategy)
def test_distributed_fold_matches_reference_fold(spark, docs):
    envelopes = [
        {
            "_index": "ix",
            "_type": "t",
            "_id": str(i),
            "_source": json.loads(json.dumps(d, sort_keys=True)),
            "_size": len(json.dumps(d)),
        }
        for i, d in enumerate(docs)
    ]
    want = mutate_objects([dict(e) for e in envelopes], _mutators())

    rows = [
        ("ix", "t", str(i), json.dumps(d, sort_keys=True), len(json.dumps(d)))
        for i, d in enumerate(docs)
    ]
    from chillastic_spark.sources import ENVELOPE_SCHEMA

    df = spark.createDataFrame(rows, ENVELOPE_SCHEMA).repartition(4)
    out = apply_data_mutators(df, _mutators())
    got = sorted(
        (
            (r["_index"], r["_id"], json.loads(r["_source"]))
            for r in out.collect()
        ),
        key=repr,
    )
    want_sorted = sorted(
        ((e["_index"], e["_id"], e["_source"]) for e in want), key=repr
    )
    assert got == want_sorted
