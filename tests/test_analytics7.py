"""Batch-14 tests: winsorized stats vs numpy, path mining vs local
replay, and more-like-this invariants."""
import numpy as np
import pyspark.sql.functions as F

from chillastic_spark.queries.analytics7 import (
    _MLT_SRC,
    _P_HI,
    _P_LO,
    more_like_this,
    top_event_paths,
    value_winsorized_stats,
)
from chillastic_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_winsorized_mean_matches_numpy(spark):
    vals = {}
    for r in load(spark, SF, "events").select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    got = {r["event_type"]: r for r in value_winsorized_stats(spark, SF).collect()}
    assert set(got) == set(vals)
    for et, v in vals.items():
        arr = np.array(v)
        lo = np.percentile(arr, _P_LO * 100, method="linear")
        hi = np.percentile(arr, _P_HI * 100, method="linear")
        want = float(np.clip(arr, lo, hi).mean())
        row = got[et]
        assert abs(row["winsorized_mean"] - want) < 1e-4, et
        assert row["n_clipped_lo"] == int((arr < lo).sum())
        assert row["n_clipped_hi"] == int((arr > hi).sum())
        assert row["n"] == len(arr)


def test_top_paths_match_local_replay(spark):
    rows = (
        load(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
        seqs.setdefault(r["user_id"], []).append(r["event_type"])
    counts = {}
    for s in seqs.values():
        for i in range(len(s) - 2):
            p = ">".join(s[i : i + 3])
            counts[p] = counts.get(p, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = [(r["path"], r["n"]) for r in top_event_paths(spark, SF).collect()]
    assert got == want


def test_more_like_this_excludes_source_and_ranks_desc(spark):
    rows = more_like_this(spark, SF).collect()
    assert rows and all(r["doc_id"] != _MLT_SRC for r in rows)
    scores = [r["mlt_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r["n_shared_terms"] <= 10 for r in rows)
    # top hit must actually share vocabulary with the source
    docs = {
        r["doc_id"]: set(r["text"].split())
        for r in load(spark, SF, "documents")
        .filter(F.col("doc_id").isin([_MLT_SRC, rows[0]["doc_id"]]))
        .collect()
    }
    assert docs[_MLT_SRC] & docs[rows[0]["doc_id"]]
