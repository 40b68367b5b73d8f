"""The contract-surface gate for the default (driver-budget) pytest
run (r10 verdict item 1): drive the driver entry points end-to-end and
oracle-check one representative query per operator family against
DuckDB at sf0.001 — the same row-count / column / order-insensitive
value-hash comparison the external gate applies (shared with
scripts/check.py). The FULL 160-query gate stays scripts/check.py;
this is the always-on smoke layer that must finish in seconds.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

# one query per operator family, cheapest exact-oracle member of each:
# relational joins/aggs, events/windows, text/tokenise, dedup pair-gen,
# minhash, connected components (splits), incremental composition,
# vectors/similarity, LM/importance, search, assembly/sharding, SQL
# surface (grouping sets)
PANEL = [
    "q1_pricing_summary",
    "events_hourly",
    "sessionize",
    "text_features",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_incremental",
    "embedding_dup_pairs",
    "dsir_importance_weights",
    "keyword_search_and",
    "leakage_safe_splits",
    "shard_manifest",
    "revenue_grouping_sets",
]


@pytest.fixture(scope="module")
def entry_env():
    import duckdb

    import __spark_entry__ as entrymod
    from chillastic_spark.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return entrymod, con


def test_entry_contract(spark, entry_env):
    """entry(spark) returns the 6-row summary; queries()/oracle_sql()
    expose the full registered inventory."""
    entrymod, _ = entry_env
    rows = entrymod.entry(spark).collect()
    assert len(rows) == 6
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 160
    assert set(oracles) <= set(qs)
    missing = [n for n in PANEL if n not in qs or n not in oracles]
    assert not missing, f"panel queries without oracle: {missing}"


@pytest.mark.parametrize("name", PANEL)
def test_oracle_twin_sf0001(spark, entry_env, name):
    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    from check import value_hash

    entrymod, con = entry_env
    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    odf = con.sql(entrymod.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf), f"{name}: value-hash mismatch"
