#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB over the sfDir tables;
compares after sorting columns by name and rows by all values.
"""
import sys, os, json, glob
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
names = sorted(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
fails = 0
for name in names:
    files = glob.glob(os.path.join(out, name, "*.parquet"))
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
    spark_df = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        print(f"{name}: rows-only ({len(spark_df)} rows)"); continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        fails += 1; continue
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    if len(a) != len(b):
        print(f"{name}: ROW COUNT spark={len(a)} duck={len(b)}"); fails += 1; continue
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        print(f"{name}: OK ({len(a)} rows)")
    except AssertionError as e:
        print(f"{name}: VALUE MISMATCH: {str(e)[:500]}"); fails += 1
print(f"\n{fails} failures / {len(names)} queries")
sys.exit(1 if fails else 0)
