"""Batch 18 (dataset assembly): the leakage invariant, split/shard
balance, manifest conservation, and plan-shape guards."""
import pytest
from pyspark.sql import functions as F

from chillastic_spark.operators import dedup as D
from chillastic_spark.queries import all_queries
from chillastic_spark.tables import load

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    from conftest import plan_of

    return plan_of(spark, all_queries()[name].fn(spark, SF))


@pytest.fixture(scope="module")
def manifest(spark):
    return all_queries()["leakage_safe_splits"].fn(spark, SF).cache()


def test_no_near_dup_pair_straddles_splits(spark, manifest):
    """THE invariant: two near-duplicate docs never land in different
    splits (train/test contamination)."""
    d = load(spark, SF, "documents")
    pairs = D.ngram_jaccard_pairs(d, n=3, threshold=0.5)
    assert pairs.count() > 0, "corpus unexpectedly has no near-dup pairs"
    a = manifest.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    b = manifest.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    straddlers = (
        pairs.join(a, "id_a").join(b, "id_b").filter(F.col("sa") != F.col("sb"))
    )
    assert straddlers.count() == 0
    # and cluster members share the representative, not just the split
    reps = manifest.groupBy("rep_id").agg(F.countDistinct("split").alias("ns"))
    assert reps.filter(F.col("ns") > 1).count() == 0


def test_split_proportions(manifest):
    counts = {r["split"]: r["n"] for r in
              manifest.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == 500
    assert set(counts) == {"train", "val", "test"}
    # 90/5/5 by hash: generous tolerance at n=500
    assert 0.80 <= counts["train"] / total <= 0.97


def test_split_assignment_is_deterministic(spark, manifest):
    again = all_queries()["leakage_safe_splits"].fn(spark, SF)
    assert manifest.exceptAll(again).count() == 0
    assert again.exceptAll(manifest).count() == 0


def test_shard_manifest_conserves_corpus(spark):
    m = all_queries()["shard_manifest"].fn(spark, SF)
    rows = m.collect()
    d = load(spark, SF, "documents")
    n_docs = d.count()
    n_tokens = d.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).collect()[0][0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["n_tokens"] for r in rows) == n_tokens
    # 3 splits × 8 shards, all shards present for train at this size
    assert {r["shard"] for r in rows if r["split"] == "train"} == set(range(8))


def test_overlap_matrix_symmetry_free_and_nonvacuous(spark):
    m = all_queries()["source_overlap_matrix"].fn(spark, SF)
    rows = m.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["source_a"] < r["source_b"]  # upper triangle only
        assert r["shared_prefixes"] >= 1
        assert r["shared_fulltext"] >= 0


def test_assembly_plans_never_cartesian(spark):
    for name in ("leakage_safe_splits", "source_overlap_matrix", "shard_manifest"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


# ---------------------------------------------- binned interval join


def test_bin_interval_join_exact_and_no_bnlj(spark):
    """The binned interval join must (a) produce exactly the rows a
    naive range predicate produces, (b) plan as an equi-join — never
    BroadcastNestedLoopJoin/CartesianProduct — and (c) emit each
    (point, interval) match exactly once even for multi-bin spans."""
    import datetime as dt

    from conftest import plan_of

    from chillastic_spark.operators.interval import bin_interval_join

    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=17 * i)) for i in range(200)],
        "pid: long, ts: timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (1, base + dt.timedelta(hours=1), base + dt.timedelta(hours=2)),
            (2, base + dt.timedelta(hours=1, minutes=30),
             base + dt.timedelta(hours=9)),  # multi-bin, overlapping
            (3, base + dt.timedelta(hours=40), base + dt.timedelta(hours=41)),
        ],
        "iid: long, start_ts: timestamp, end_ts: timestamp",
    )
    got = bin_interval_join(pts, "ts", ivs, "start_ts", "end_ts")
    got_set = sorted((r["pid"], r["iid"]) for r in got.collect())
    want = sorted(
        (p["pid"], i["iid"])
        for p in pts.collect()
        for i in ivs.collect()
        if i["start_ts"] <= p["ts"] < i["end_ts"]
    )
    assert got_set == want and len(want) > 0
    assert len(got_set) == len(set(got_set))  # exactly-once per match

    plan = plan_of(spark, got)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_busy_window_counts_plan(spark):
    plan = _plan(spark, "busy_window_counts")
    assert "CartesianProduct" not in plan
    # the events↔windows range join must ride the bin EQUI-join (hash
    # join with the range as residual) — the only nested-loop allowed
    # is the benign 1-row totals broadcast (condition on n_hours/total)
    bnlj = [
        seg for seg in plan.split("\n\n")
        if seg.startswith("(") and "BroadcastNestedLoopJoin" in seg
    ]
    for seg in bnlj:
        assert "total" in seg and "ts#" not in seg.split("Join condition:")[1], seg
    assert len(bnlj) <= 1


def test_bin_interval_join_edge_intervals(spark):
    """Zero-length and inverted intervals match nothing (not crash);
    a pre-existing __bin column is rejected loudly."""
    import datetime as dt

    import pytest as _pytest

    from chillastic_spark.operators.interval import bin_interval_join

    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=30))], "pid: long, ts: timestamp"
    )
    ivs = spark.createDataFrame(
        [
            (1, base, base),                                  # empty [t, t)
            (2, base + dt.timedelta(hours=2), base),          # inverted
            (3, base, base + dt.timedelta(hours=1)),          # real
        ],
        "iid: long, start_ts: timestamp, end_ts: timestamp",
    )
    got = [r["iid"] for r in
           bin_interval_join(pts, "ts", ivs, "start_ts", "end_ts").collect()]
    assert got == [3]

    with _pytest.raises(ValueError, match="__bin"):
        bin_interval_join(
            pts.withColumn("__bin", pts["ts"]), "ts", ivs, "start_ts", "end_ts"
        )


def test_write_sharded_reuses_manifest_shard(spark, tmp_path):
    """A manifest's shard column is authoritative: write_sharded must
    not recompute it with a different n_shards."""
    import glob

    from chillastic_spark.operators.assembly import write_sharded
    from chillastic_spark.pipelines import assemble

    rows = [(i, f"doc {i} words here", "src0") for i in range(1, 40)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    manifest, _ = assemble(
        df, pairs=spark.createDataFrame([], "id_a: long, id_b: long"), n_shards=16
    )
    out = str(tmp_path / "ds16")
    write_sharded(manifest, out)  # default n_shards=8 must NOT apply
    back = spark.read.parquet(out)
    got = {(r["doc_id"], r["shard"]) for r in back.select("doc_id", "shard").collect()}
    want = {(r["doc_id"], r["shard"]) for r in manifest.collect()}
    assert got == want
    shards = {int(d.rsplit("=", 1)[1]) for d in glob.glob(f"{out}/split=*/shard=*")}
    assert max(shards) >= 8  # 16-shard manifest survived


def test_bin_interval_join_other_units(spark):
    """minute and day bin units produce the same exact matches."""
    import datetime as dt

    from chillastic_spark.operators.interval import bin_interval_join

    base = dt.datetime(2024, 3, 1)
    pts = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=40 * i)) for i in range(100)],
        "pid: long, ts: timestamp",
    )
    ivs = spark.createDataFrame(
        [(1, base + dt.timedelta(hours=3, minutes=7),
          base + dt.timedelta(hours=30, minutes=1))],
        "iid: long, start_ts: timestamp, end_ts: timestamp",
    )
    want = sorted(
        p["pid"] for p in pts.collect()
        for i in ivs.collect()
        if i["start_ts"] <= p["ts"] < i["end_ts"]
    )
    for unit in ("minute", "day"):
        got = sorted(
            r["pid"] for r in
            bin_interval_join(pts, "ts", ivs, "start_ts", "end_ts", unit=unit)
            .collect()
        )
        assert got == want, unit
