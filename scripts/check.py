#!/usr/bin/env python
"""Local twin of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir; compares row count, column names, and an
order-insensitive value hash. Exit 1 on any mismatch.

Usage: python scripts/check.py [sf_dir] [query ...]
"""
from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from chillastic_spark.session import get_spark
from chillastic_spark.tables import TABLES


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # dtype-faithful normalisation: ints and floats must NOT collide
    # (a DuckDB HUGEINT→float64 7.0 is a real mismatch vs Spark int64 7,
    # and the driver's gate sees it — so must we), and floats keep full
    # repr precision rather than 9 significant digits.
    def norm(v):
        # np.floating too: np.float32 is NOT a float subclass, and an
        # unnormalized float32 NaN strs to 'nan' while the other
        # engine's float64 NaN normalizes to NULL — a false mismatch
        if v is None or (isinstance(v, (float, np.floating)) and pd.isna(v)):
            return "NULL"
        if isinstance(v, (bool, np.bool_)):
            return "T" if v else "F"
        if isinstance(v, (float, np.floating)):
            return repr(float(v))
        return str(v)

    rows = sorted(
        "\x1f".join(norm(v) for v in rec) for rec in df.itertuples(index=False, name=None)
    )
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # scaling dirs (scripts/make_sf1.py) can be multi-file parquet
        # DIRECTORIES named <table>.parquet — DuckDB needs the glob
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - qs.keys()
    if unknown:
        # a typo must not skip everything and exit 0 with '0 failures'
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    failures = []
    twin_results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            from twins import TWINS

            if name in TWINS:
                # value-level local twin (pure-Python/duckdb exact
                # recompute or pinned error/recall bound) — the
                # rows-only queries' evidence gate (r5 verdict #1)
                try:
                    ok, detail = TWINS[name](sdf, sf_dir, con)
                except Exception as e:  # noqa: BLE001
                    ok, detail = False, f"twin error: {e}"
                twin_results[name] = {
                    "pass": bool(ok),
                    "detail": detail,
                    "rows": len(sdf),
                    "spark_sec": round(spark_t, 2),
                }
                if ok:
                    print(f"TWIN-PASS  {name} ({len(sdf)} rows, {spark_t:.1f}s): {detail}")
                else:
                    failures.append(name)
                    print(f"FAIL  {name}: twin: {detail}")
            else:
                print(f"ok?   {name}: rows-only ({len(sdf)} rows, {spark_t:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
            # show a small diff aid
            if "value-hash mismatch" in problems and len(sdf) == len(odf):
                s = sdf.reindex(sorted(sdf.columns), axis=1).sort_values(
                    list(sorted(sdf.columns))
                ).reset_index(drop=True)
                o = odf.reindex(sorted(odf.columns), axis=1).sort_values(
                    list(sorted(odf.columns))
                ).reset_index(drop=True)
                neq = (s.astype(str) != o.astype(str)).any(axis=1)
                print("  spark:", s[neq].head(3).to_dict("records"))
                print("  duck :", o[neq].head(3).to_dict("records"))
        else:
            print(f"PASS  {name} ({len(sdf)} rows, {spark_t:.1f}s)")
    from chillastic_spark.session import calibrate

    print(f"calibration_sec: {calibrate(spark):.3f}")
    _emit_twins(twin_results, sf_dir)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


def _emit_twins(twin_results: dict, sf_dir: str) -> None:
    """Persist the rows-only queries' twin evidence as a committed
    TWINS_r{N}.json (r6 verdict #8): the driver's CORRECTNESS rows for
    these queries always read 'no_oracle', and TWIN-PASS lines vanish
    with the gate log — this file makes the bound checked, the measured
    error, and the verdict as durable as the oracle rows. Only a run
    covering EVERY registered twin emits (a subset run must not
    overwrite full evidence with partial)."""
    import json
    import re

    from twins import TWINS

    if set(twin_results) != set(TWINS):
        return
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.environ.get("SPARK_GRAFT_TWINS_OUT")
    if not out:
        rounds = [
            int(m.group(1))
            for f in os.listdir(root)
            if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))
        ]
        n = (max(rounds) + 1) if rounds else 0
        out = os.path.join(root, f"TWINS_r{n:02d}.json")
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "twins": twin_results}, f, indent=1)
    print(f"twin evidence written: {out}")


if __name__ == "__main__":
    sys.exit(main())
