"""Watermarked windowed aggregation + applyInPandasWithState custom
stateful operator, checked against their batch twins."""
import pytest

from pyspark.sql import functions as F

from chillastic_spark.streaming import stateful_sessionize, windowed_event_counts

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def events_dir(tmp_path):
    """Time-ordered multi-file staging — see conftest.stage_events_stream."""
    from conftest import stage_events_stream

    return stage_events_stream(tmp_path)


def test_windowed_counts_match_batch(spark, tmp_path, events_dir):
    q = windowed_event_counts(
        spark,
        events_dir,
        str(tmp_path / "ck-win"),
        query_name="win_t1",
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_t1").collect()
    }
    # batch twin over the same file
    from chillastic_spark.tables import load

    batch = (
        load(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # same rounding rule as the stream AND events_hourly:
            # round the DECIMAL, then cast
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("win.start").alias("ws"), "event_type", "cnt", "sum_value")
        .collect()
    )
    expected = {(r["ws"], r["event_type"]): (r["cnt"], r["sum_value"]) for r in batch}
    # append mode emits only windows closed by the watermark; every
    # emitted window must match the batch result exactly
    assert len(got) > 0
    for k, v in got.items():
        assert expected[k] == v


def test_stateful_sessionize_matches_batch(spark, tmp_path, events_dir):
    q = stateful_sessionize(
        spark,
        events_dir,
        str(tmp_path / "ck-sess"),
        query_name="sess_t1",
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT user_id, max(n_sessions) AS n_sessions, max(n_events) AS n_events "
        "FROM sess_t1 GROUP BY user_id"
    ).collect()
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in rows}

    from chillastic_spark.queries.engine_parity import sessionize

    expected = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in sessionize(spark, SF_DIR).collect()
    }
    assert got == expected


def test_sessionize_late_event_never_regresses_frontier(spark, tmp_path):
    """A late event arriving in a LATER micro-batch must not drag the
    per-user frontier (last_ts) backwards: the next in-order event would
    measure its gap against the stale timestamp and open a spurious
    session. Stage 5 files (reader takes 4/trigger) so the late event
    is in batch 2."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chillastic_spark.streaming import stateful_sessionize

    d = tmp_path / "late_stream"
    d.mkdir()
    base = 1_600_000_000 * 1_000_000  # epoch µs
    m = 60 * 1_000_000

    def write(i, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        p = str(d / f"part-{i:04d}.parquet")
        pq.write_table(tbl, p)
        t = time.time() + i  # ascending mtimes fix batch order
        os.utime(p, (t, t))

    # batch 1 (files 0-3): frontier ends at base+12min, one session
    write(0, [(1, base)])
    write(1, [(2, base + 10 * m)])
    write(2, [(3, base + 11 * m)])
    write(3, [(4, base + 12 * m)])
    # batch 2 (file 4): late event at +5min, then in-order at +40min.
    # 40-12=28min < 30min gap → SAME session. A regressed frontier
    # (last_ts=5min) would see 35min > gap and open a spurious one.
    write(4, [(5, base + 5 * m), (6, base + 40 * m)])

    q = stateful_sessionize(
        spark, str(d), str(tmp_path / "ck-late"), gap_minutes=30, query_name="sess_late"
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT max(n_sessions) AS s, max(n_events) AS e FROM sess_late"
    ).collect()
    assert (rows[0]["s"], rows[0]["e"]) == (1, 6)


def test_windowed_distinct_users_matches_batch_hll(spark, tmp_path, events_dir):
    """Streaming HLL result == batch HLL over the same data (the sketch
    is deterministic), and within 5% of exact distinct counts."""
    from chillastic_spark.streaming import windowed_distinct_users
    from chillastic_spark.tables import load

    q = windowed_distinct_users(
        spark, events_dir, str(tmp_path / "ck-hll"), query_name="hll_t1"
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): r["approx_users"]
        for r in spark.sql("SELECT * FROM hll_t1").collect()
    }
    e = load(spark, SF_DIR, "events")
    batch = {
        (r["ws"], r["event_type"]): (r["approx"], r["exact"])
        for r in e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .select(F.col("win.start").alias("ws"), "event_type", "approx", "exact")
        .collect()
    }
    # append mode emits only windows closed by the watermark — every
    # emitted window must match the batch sketch exactly
    assert len(got) > 0
    for k, approx_stream in got.items():
        approx_batch, exact = batch[k]
        assert approx_stream == approx_batch, k
        assert abs(approx_stream - exact) <= max(2, 0.05 * exact), (k, approx_stream, exact)


def test_stream_stream_interval_join_matches_batch(spark, tmp_path, events_dir):
    from chillastic_spark.queries.analytics3 import purchase_prior_window
    from chillastic_spark.streaming import purchase_attribution_stream

    q = purchase_attribution_stream(
        spark, events_dir, str(tmp_path / "ck-ssj"), query_name="ssj_t1"
    )
    q.awaitTermination(180)
    got = {
        r["p_event_id"]: r["n"]
        for r in spark.table("ssj_t1")
        .groupBy("p_event_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        r["event_id"]: r["n_prior"]
        for r in purchase_prior_window(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0


def test_heavy_hitters_stream_bound(spark, tmp_path):
    """Sharded streaming Misra-Gries: after draining the stream, every
    token's merged estimate obeys est <= true <= est + shard_err, and
    every token whose true count exceeds its shard's error mass is
    present — the classic MG guarantee, per shard."""
    import zlib

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from chillastic_spark.streaming import heavy_hitters_stream
    from chillastic_spark.tables import load

    d = load(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    pdf = d.toPandas()
    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    step = max(1, len(pdf) // 4)
    for i in range(4):
        chunk = pdf.iloc[i * step :] if i == 3 else pdf.iloc[i * step : (i + 1) * step]
        if len(chunk):
            pq.write_table(
                pa.Table.from_pandas(chunk, preserve_index=False),
                str(stream_dir / f"p{i:02d}.parquet"),
            )

    shards, capacity = 4, 32
    q = heavy_hitters_stream(
        spark,
        str(stream_dir),
        str(tmp_path / "ckpt"),
        docs_schema=d.schema,
        shards=shards,
        capacity=capacity,
        query_name="hh_test",
    )
    q.awaitTermination(120)

    rows = spark.sql("select * from hh_test").collect()
    assert rows
    latest_version = {}
    for r in rows:
        latest_version[r["shard"]] = max(
            latest_version.get(r["shard"], 0), r["version"]
        )
    est, err = {}, {}
    for r in rows:
        if r["version"] == latest_version[r["shard"]]:
            err[r["shard"]] = r["err"]
            if r["token"] is not None:  # null = empty-counters sentinel
                est[r["token"]] = r["est"]

    true = {}
    for t in pdf["text"]:
        for tok in t.strip().split():
            true[tok] = true.get(tok, 0) + 1

    for tok, cnt in true.items():
        shard = zlib.crc32(tok.encode()) % shards
        bound = err.get(shard, 0)
        e = est.get(tok, 0)
        assert e <= cnt <= e + bound, (tok, e, cnt, bound)
        if cnt > bound:
            assert tok in est, tok
    # state stayed bounded
    from collections import Counter

    per_shard = Counter(
        r["shard"] for r in rows if r["version"] == latest_version[r["shard"]]
    )
    assert all(v <= capacity for v in per_shard.values())


def test_sessionize_drops_null_ts_rows(spark, tmp_path):
    """A NULL ts reaches pandas as NaT (INT64_MIN) and used to open up
    to two phantom sessions per null row — null-ts events are dropped
    like every watermarked twin drops them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chillastic_spark.streaming import stateful_sessionize

    d = tmp_path / "null_ts_stream"
    d.mkdir()
    base = 1_600_000_000 * 1_000_000
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([base, None, base + 60_000_000], pa.int64()),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_type": pa.array(["view"] * 3),
            "value": pa.array([1.0] * 3),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(tbl, str(d / "part-0.parquet"))
    q = stateful_sessionize(
        spark, str(d), str(tmp_path / "ck-null"), gap_minutes=30,
        query_name="sess_null",
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT max(n_sessions) AS s, max(n_events) AS e FROM sess_null"
    ).collect()
    assert (rows[0]["s"], rows[0]["e"]) == (1, 2)
