import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chillastic_spark.sources import ENVELOPE_SCHEMA, DocumentStore  # noqa: E402


def _slow_manifest() -> set:
    """Node ids excluded from the default (driver-budget) run — see
    pytest.ini. The manifest is MEASURED (full-suite --durations=0,
    call time >= 3s), not hand-curated; regenerate it when the suite's
    cost profile changes."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "slow_manifest.txt")
    try:
        with open(path) as f:
            return {
                line.strip() for line in f
                if line.strip() and not line.startswith("#")
            }
    except OSError:
        return set()


def pytest_collection_modifyitems(config, items):
    slow = _slow_manifest()
    if not slow:
        return
    for item in items:
        if item.nodeid in slow:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("chillastic-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def stage_events_stream(tmp_path, n_files: int = 16) -> str:
    """Stage events.parquet as ``n_files`` TIME-ORDERED stream files.

    Append-mode watermark semantics: the watermark only advances AFTER a
    micro-batch, so a single-file source processed in one availableNow
    batch emits NOTHING. Splitting the input into time-ordered files with
    ascending mtimes gives the file source multiple batches in event-time
    order — the watermark advances between them and closed windows emit,
    while no in-order data is ever late-dropped.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "events_stream"
    d.mkdir()
    tbl = pq.read_table("/root/testdata/sf0.001/events.parquet")
    df = tbl.to_pandas().sort_values("ts", kind="mergesort").reset_index(drop=True)
    # stream-dir contract: ts as raw int64 epoch-MICROS, whatever time
    # unit the source parquet uses (read_events_stream reads LongType)
    df["ts"] = df["ts"].astype("datetime64[us]").astype("int64")
    base = 1_600_000_000
    step = max(1, len(df) // n_files)
    for i in range(n_files):
        chunk = df.iloc[i * step :] if i == n_files - 1 else df.iloc[i * step : (i + 1) * step]
        if len(chunk) == 0:
            continue
        path = str(d / f"part-{i:04d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            path,
            version="2.6",  # int64 ts column — no timestamp logical type left
        )
        os.utime(path, (base + i, base + i))  # mtime order == event-time order
    return str(d)


@pytest.fixture
def store_factory(spark, tmp_path):
    """Build DocumentStores with envelope corpora (FIXTURES.md F1/F3)."""

    def make(name: str, corpora: dict | None = None, indices_cfg: dict | None = None,
             templates: dict | None = None) -> DocumentStore:
        store = DocumentStore(str(tmp_path / name))
        cfg = dict(indices_cfg or {})
        for index, docs in (corpora or {}).items():
            rows = []
            types = set()
            for i, d in enumerate(docs):
                src = json.dumps(d.get("_source", {}), sort_keys=True)
                rows.append(
                    (
                        index,
                        d.get("_type", "doc"),
                        str(d.get("_id", i)),
                        src,
                        int(d.get("_size", len(src))),
                    )
                )
                types.add(d.get("_type", "doc"))
            df = spark.createDataFrame(rows, ENVELOPE_SCHEMA)
            store.write_documents(df, index)
            cfg.setdefault(
                index,
                {
                    "settings": {"index": {"number_of_shards": 1}},
                    "mappings": {t: {"properties": {}} for t in sorted(types)},
                    "aliases": {},
                },
            )
        store.put_indices([dict(c, name=n) for n, c in cfg.items()])
        if templates:
            store.put_templates([dict(c, name=n) for n, c in templates.items()])
        return store

    return make


def docs_f1(n=20, index_type="mytype1"):
    """F1 golden-transfer corpus (tests/services/lotsOfData.json shape)."""
    return [
        {"_id": f"id{i}", "_type": index_type, "_source": {"someField_1": f"something {i}"}}
        for i in range(n)
    ]


def plan_of(spark, df) -> str:
    """Formatted physical plan (delegates to the one shared explain
    helper, chillastic_spark.plans.formatted_plan)."""
    from chillastic_spark.plans import formatted_plan

    return formatted_plan(df)
