"""The mutator-chain operator (SURVEY P1/P2, transfer.js:271-284).

Fold an ordered mutator list over each document: when
``predicate(doc, args)`` holds, replace the doc with
``mutate(doc, args)``; a null/empty result drops the row. Non-matching
docs pass through unmutated.

Data mutators are arbitrary dict→dict Python, so the operator runs as
``mapInPandas`` (Arrow batches, one Python roundtrip for the whole
chain — never one UDF per mutator). Column-expression fast paths for
the common rename/regex/date cases live in the queries layer; this is
the fully-general path.
"""
from __future__ import annotations

from typing import Any, Iterable, Optional

from pyspark.sql import DataFrame

from chillastic_spark.sources import ENVELOPE_SCHEMA


def should_drop(doc: Any) -> bool:
    """Null/empty ⇒ drop (transfer.js:272: isUndefined/isNull/isEmpty)."""
    return doc is None or doc == {} or doc == [] or doc == ""


def apply_chain(doc: Any, mutators: list) -> Any:
    """Fold the chain over one object (dict). Driver-side use for
    index/template configs; executor-side for documents."""
    for m in mutators:
        if should_drop(doc):
            return None
        if m.predicate(doc, m.arguments):
            doc = m.mutate(doc, m.arguments)
    return None if should_drop(doc) else doc


def mutate_objects(objs: Iterable[dict], mutators: Optional[list]) -> list[dict]:
    """transfer.js:271-284 — list-in/list-out, drops removed."""
    if not mutators:
        return list(objs)
    out = []
    for obj in objs:
        r = apply_chain(obj, mutators)
        if r is not None:
            out.append(r)
    return out


# NOT "_quarantine": Elasticsearch rejects index names with a leading
# underscore, so the error side-channel itself would hard-fail bulk
# delivery on an ES destination — the exact failure it exists to absorb
QUARANTINE_INDEX = "chillastic-quarantine"


def apply_data_mutators(
    df: DataFrame, mutators: Optional[list], quarantine: bool = False
) -> DataFrame:
    """Apply data-type mutators to an envelope DataFrame.

    Each row becomes {_index,_type,_id,_source: dict,_size}; the mutated
    doc's envelope fields are written back (mutators may re-route
    _index — examples/mutators/indexDate.js). No-op without mutators.

    ``quarantine=True`` is the per-record error side-channel (SURVEY S5,
    the badRecordsPath analog of transfer.js:306-352's bulk-error
    handling): a doc whose mutator raises is routed to the
    ``QUARANTINE_INDEX`` index carrying the error + original payload
    instead of failing the whole slice. Default (False) propagates,
    matching the reference's subtask-level error logging.
    """
    if not mutators:
        return df

    # The closure must be SELF-CONTAINED: registered mutator functions
    # come from exec'd code (cloudpickled by value), but referencing any
    # chillastic_spark symbol would make executors import this package —
    # which isn't on the Python-worker path unless the user shipped it
    # (--py-files). Plain tuples + inline drop logic avoid that.
    chain = [(m.predicate, m.mutate, m.arguments) for m in mutators]
    do_quarantine = quarantine
    q_index = QUARANTINE_INDEX  # captured by value: closure stays self-contained

    def run(batches):
        import json as _json

        import pandas as _pd

        def _drop(d):
            return d is None or d == {} or d == [] or d == ""

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                try:
                    # decode INSIDE the guard: a corrupt _source string
                    # (truncated upstream write, hand-edited parquet) is
                    # per-record bad data — outside the try it would
                    # bypass the quarantine side-channel and kill the
                    # whole slice after retries
                    doc = {
                        "_index": rec["_index"],
                        "_type": rec["_type"],
                        "_id": rec["_id"],
                        "_source": _json.loads(rec["_source"]) if rec["_source"] else {},
                        "_size": rec.get("_size"),
                    }
                    for pred, mut, args in chain:
                        if _drop(doc):
                            doc = None
                            break
                        if pred(doc, args):
                            doc = mut(doc, args)
                    # serialize INSIDE the guard: a mutator returning a
                    # non-dict or non-JSON-serializable _source (e.g. a
                    # datetime) is user-code failure too — outside the
                    # try it would bypass the quarantine side-channel
                    # and kill the slice
                    out_row = None
                    if not _drop(doc):
                        out_row = {
                            "_index": doc.get("_index"),
                            "_type": doc.get("_type"),
                            "_id": doc.get("_id"),
                            "_source": _json.dumps(
                                doc.get("_source", {}), sort_keys=True
                            ),
                            "_size": doc.get("_size"),
                        }
                except Exception as e:  # noqa: BLE001 — user-code boundary
                    if not do_quarantine:
                        raise
                    rows.append(
                        {
                            "_index": q_index,
                            "_type": rec["_type"],
                            "_id": f"{rec['_index']}/{rec['_id']}",
                            "_source": _json.dumps(
                                {
                                    "error": repr(e),
                                    "original_index": rec["_index"],
                                    "original_source": rec["_source"],
                                },
                                sort_keys=True,
                            ),
                            "_size": rec.get("_size"),
                        }
                    )
                    continue
                if out_row is None:
                    continue
                rows.append(out_row)
            yield _pd.DataFrame(
                rows, columns=["_index", "_type", "_id", "_source", "_size"]
            )

    return df.mapInPandas(run, ENVELOPE_SCHEMA)
