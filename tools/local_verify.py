#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate — STRICT mode.

Usage: python3 tools/local_verify.py [sfDir] [outDir]

Mirrors the inferred driver semantics exactly:
  * Spark side: pd.read_parquet(outDir/<name>)  (DECIMAL -> decimal.Decimal
    objects, DATE -> datetime.date objects — i.e. NOT floats/timestamps).
  * Oracle side: duckdb .fetchdf()  (DECIMAL/HUGEINT -> float64,
    DATE -> datetime64).
  * Columns sorted by name, rows sorted by all columns (pandas
    sort_values — crashes on array columns, exactly like the driver).
  * Every cell compared as str(); any difference is a FAIL. This is
    stricter than numeric equality on purpose: the driver hashes
    rendered values, so Decimal('3549.00') != 3549.0 != 3549.

Consequences for query authors (see memory: graft-oracle-parity-rules):
  - final money/ratio columns: CAST(... AS DOUBLE) on BOTH sides
  - integer sums in DuckDB are HUGEINT: CAST(SUM(..) AS BIGINT)
  - no DATE-typed output columns: render yyyy-MM-dd strings
  - no array-typed output columns: concat_ws/to_json them
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame):
    """Sort columns by name, rows by all columns; return (df, dtypes)."""
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cell_str(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float) and np.isnan(v):
        return "<NULL>"
    try:
        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = n_rows_only = 0
    # queries that crashed inside graft.Verify are recorded in
    # _errors.json rather than silently missing from the output set
    err_path = f"{out_dir}/_errors.json"
    if os.path.exists(err_path):
        with open(err_path) as f:
            for name, msg in sorted(json.load(f).items()):
                print(f"  ✗ {name}: QUERY CRASHED IN VERIFY: {msg}")
                n_fail += 1
    produced = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
    for name in sorted(produced):
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
        # the driver sorts the spark result even for rows-only checks;
        # array-typed columns crash pandas lexsort there too
        try:
            s = canon(spark_df)
        except Exception as e:
            print(f"  ✗ {name}: SPARK RESULT UNSORTABLE (driver would crash): {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"  ~ {name}: no oracle (rows-only) rows={len(spark_df)}")
            n_rows_only += 1
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        try:
            d = canon(duck_df)
        except Exception as e:
            print(f"  ✗ {name}: ORACLE RESULT UNSORTABLE: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(s.columns) != list(d.columns):
            print(f"  ✗ {name}: COLUMNS spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"  ✗ {name}: ROWS spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        bad = []
        for c in s.columns:
            sv = [cell_str(v) for v in s[c]]
            dv = [cell_str(v) for v in d[c]]
            if sv != dv:
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if a != b]
                bad.append((c, str(s[c].dtype), str(d[c].dtype), diffs[:3]))
        if bad:
            print(f"  ✗ {name}: {len(bad)} column(s) render differently")
            for c, sd, dd, diffs in bad:
                print(f"      col {c}: spark dtype={sd} duck dtype={dd}")
                for i, a, b in diffs:
                    print(f"        row {i}: spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            dt_note = ""
            if list(map(str, s.dtypes.values)) != list(map(str, d.dtypes.values)):
                dt_note = f"  [dtype differs: {list(map(str, s.dtypes.values))} vs {list(map(str, d.dtypes.values))} — strings match anyway]"
            print(f"  ✓ {name} ({len(s)} rows){dt_note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
