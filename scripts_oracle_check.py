#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run each oracle SQL in DuckDB
against the sf tables, compare to the Spark parquet dump (columns sorted
by name, rows sorted, values hashed)."""
import duckdb, json, sys, glob

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING OUTPUT {name}"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        exp = con.sql(sql).df()
        got = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
        exp = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fail += 1; continue
        import pandas as pd
        eq = got.equals(exp)
        if not eq:
            # tolerate dtype-only diffs by stringifying
            eq = got.astype(str).equals(exp.astype(str))
        if eq: print(f"OK   {name} ({len(got)} rows)"); ok += 1
        else:
            diff = (got.astype(str) != exp.astype(str)).any(axis=1)
            print(f"FAIL {name}: value mismatch in {diff.sum()} rows; first:\n{got[diff].head(2)}\nvs\n{exp[diff].head(2)}"); fail += 1
    except Exception as e:
        print(f"ERROR {name}: {e}"); fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
