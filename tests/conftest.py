import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chillastic_spark.sources import ENVELOPE_SCHEMA, DocumentStore  # noqa: E402


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
