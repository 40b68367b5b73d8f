"""Batch-9 operator tests: percentile interpolation vs numpy,
basket pairs vs a local brute force, split determinism/completeness,
and the pivot→unpivot identity."""
import itertools

import numpy as np
import pyspark.sql.functions as F

from chillastic_spark.queries.analytics5 import (
    basket_part_pairs,
    dataset_split_manifest,
    events_unpivot_roundtrip,
    value_percentiles,
)
from chillastic_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_value_percentiles_match_numpy_linear(spark):
    """The explicit rank-interpolation must equal numpy's 'linear'
    percentile (the percentile_cont definition) per event type."""
    vals = {}
    for r in load(spark, SF, "events").select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    got = {r["event_type"]: r for r in value_percentiles(spark, SF).collect()}
    assert set(got) == set(vals)
    for et, v in vals.items():
        arr = np.sort(np.array(v))
        for name, p in [("p50", 50), ("p90", 90), ("p99", 99)]:
            want = np.percentile(arr, p, method="linear")
            assert abs(got[et][name] - want) < 1e-5, (et, name)


def test_basket_pairs_match_local_bruteforce(spark):
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    baskets = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    counts = {}
    for parts in baskets.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    want = sorted(
        ((n, a, b) for (a, b), n in counts.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    got = [
        (r["n_orders"], r["part_a"], r["part_b"])
        for r in basket_part_pairs(spark, SF).collect()
    ]
    assert got == want


def test_dataset_split_is_complete_and_deterministic(spark):
    m1 = {(r["split"], r["lang"]): (r["n_docs"], r["total_chars"])
          for r in dataset_split_manifest(spark, SF).collect()}
    m2 = {(r["split"], r["lang"]): (r["n_docs"], r["total_chars"])
          for r in dataset_split_manifest(spark, SF).collect()}
    assert m1 == m2 and m1
    total_docs = sum(n for n, _ in m1.values())
    assert total_docs == load(spark, SF, "documents").count()
    by_split = {}
    for (split, _), (n, _c) in m1.items():
        by_split[split] = by_split.get(split, 0) + n
    assert set(by_split) == {"train", "val", "test"}
    # hash gate tracks the 80/10/10 design within sampling noise
    assert by_split["train"] / total_docs > 0.7
    assert by_split["val"] / total_docs < 0.2
    assert by_split["test"] / total_docs < 0.2


def test_unpivot_roundtrip_is_identity(spark):
    e = load(spark, SF, "events")
    want = {
        (r["hour"], r["event_type"]): r["n"]
        for r in e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(F.count("*").alias("n")).collect()
    }
    got = {
        (r["hour"], r["event_type"]): r["n_events"]
        for r in events_unpivot_roundtrip(spark, SF).collect()
    }
    assert got == want
