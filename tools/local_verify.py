#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/local_verify.py [sfDir] [outDir]

Reads each parquet result written by `graft.Verify`, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, and
compares: schema (column names), row count, and values (columns sorted
by name, rows sorted by all columns). Floats compared with tight
tolerance AND reported if not bit-equal, since the real driver may hash
exact bytes.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types for comparison
    import decimal
    for c in df.columns:
        if str(df[c].dtype) == "object":
            if df[c].map(lambda v: isinstance(v, decimal.Decimal) or v is None).all() and df[c].notna().any():
                df[c] = df[c].astype(float)
            else:
                df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        if "datetime" in str(df[c].dtype):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    import glob
    import os
    produced = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
    for name in sorted(produced):
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracles:
            print(f"  ~ {name}: no oracle (rows-only) rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        s, d = normalize(spark_df), normalize(duck_df)
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
            sv, dv = s[c], d[c]
            if str(sv.dtype).startswith("float") or str(dv.dtype).startswith("float"):
                import numpy as np
                eq = np.allclose(sv.astype(float), dv.astype(float), rtol=1e-9, atol=1e-12, equal_nan=True)
                biteq = (sv.astype(float).values == dv.astype(float).values).all()
                if not eq:
                    bad.append((c, "float mismatch"))
                elif not biteq:
                    bad.append((c, "float close but NOT bit-equal (driver hash may differ!)"))
            else:
                try:
                    eq = sv.equals(dv) or (sv.astype(str).values == dv.astype(str).values).all()
                except Exception:
                    eq = False
                if not eq:
                    bad.append((c, "value mismatch"))
        if bad:
            print(f"  ✗ {name}: {bad}")
            for c, _ in bad[:1]:
                diff = s[c].astype(str) != d[c].astype(str)
                idx = diff[diff].index[:5] if diff.any() else []
                for i in idx:
                    print(f"      row {i} col {c}: spark={s[c][i]!r} duck={d[c][i]!r}")
            n_fail += 1
        else:
            print(f"  ✓ {name} ({len(s)} rows, dtypes match={list(s.dtypes.values) == list(d.dtypes.values)})")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(produced) - n_pass - n_fail} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
