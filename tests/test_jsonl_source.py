"""JSONL / CSV source-sink: schema-first reads, corrupt-line
quarantine, partitioned writes with pruning."""
from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from chillastic_spark.sources.jsonl import read_csv, read_jsonl, write_jsonl

SCHEMA = "doc_id BIGINT, text STRING, lang STRING"


def test_jsonl_roundtrip_with_quarantine(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        "this line is not json at all\n"
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}\n'
        '{"doc_id": 3, "text": "broken"'  # truncated record
        "\n",
    )
    good, quarantine = read_jsonl(spark, str(src), SCHEMA)
    rows = {r["doc_id"]: r["text"] for r in good.collect()}
    assert rows == {1: "hello world", 2: "bonjour"}
    bad = [r["_corrupt_record"] for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)

    out = tmp_path / "out"
    write_jsonl(good, str(out), partition_by="lang", compression=None)
    back, q2 = read_jsonl(spark, str(out), "doc_id BIGINT, text STRING")
    assert q2.count() == 0
    assert {r["doc_id"] for r in back.collect()} == {1, 2}
    # physical layout partitioned by lang → directory per value
    assert sorted(
        d for d in os.listdir(out) if d.startswith("lang=")
    ) == ["lang=en", "lang=fr"]


def test_jsonl_partition_pruning_reaches_scan(spark, tmp_path):
    out = tmp_path / "docs"
    df = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "fr"), (3, "c", "en")], SCHEMA
    )
    write_jsonl(df, str(out), partition_by="lang", compression=None)
    good, _ = read_jsonl(spark, str(out), "doc_id BIGINT, text STRING")
    # lang is a partition column on the read side
    pruned = spark.read.schema("doc_id BIGINT, text STRING").json(str(out)).filter(
        F.col("lang") == "en"
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_jsonl_rejects_predeclared_corrupt_col(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        read_jsonl(spark, str(tmp_path), "a BIGINT, _corrupt_record STRING")


def test_csv_quarantine(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text(
        "doc_id,text,lang\n"
        "1,hello,en\n"
        "not-a-number,oops,fr\n"
        "2,welt,de\n"
    )
    good, quarantine = read_csv(spark, str(src), SCHEMA)
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    assert quarantine.count() == 1


def test_jsonl_reads_gzip(spark, tmp_path):
    src = tmp_path / "in.jsonl.gz"
    with gzip.open(src, "wt") as f:
        f.write('{"doc_id": 9, "text": "zipped", "lang": "en"}\n')
    good, quarantine = read_jsonl(spark, str(src), SCHEMA)
    assert [r["doc_id"] for r in good.collect()] == [9]
    assert quarantine.count() == 0
