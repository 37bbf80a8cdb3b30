#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles: replays every oracle SQL in
DuckDB over the sf tables and compares against the Verify parquet dumps the
same way the driver does (columns sorted by name, rows sorted, values
compared)."""
import json, sys, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r2"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_files = glob.glob(f"{out_dir}/{name}.parquet/*.parquet") or \
        glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"{name}: MISSING spark output"); fails += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files], ignore_index=True)
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    s, o = canon(sdf), canon(odf)
    if list(s.columns) != list(o.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(s.columns)} oracle={list(o.columns)}")
        fails += 1; continue
    if len(s) != len(o):
        print(f"{name}: ROWS MISMATCH spark={len(s)} oracle={len(o)}"); fails += 1; continue
    eq = True
    for c in s.columns:
        a, b = s[c], o[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            ok = ((a.astype(float) - b.astype(float)).abs() < 1e-9) | (a.isna() & b.isna())
        else:
            try:
                ok = (a == b) | (a.isna() & b.isna())
            except Exception:
                ok = a.astype(str) == b.astype(str)
        if not ok.all():
            bad = (~ok).idxmax()
            print(f"{name}: VALUE MISMATCH col={c} row={bad} spark={a[bad]!r} oracle={b[bad]!r}")
            eq = False; break
    if eq:
        print(f"{name}: OK ({len(s)} rows)")
    else:
        fails += 1
sys.exit(1 if fails else 0)
