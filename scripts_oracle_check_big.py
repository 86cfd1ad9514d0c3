#!/usr/bin/env python3
"""Scale variant of scripts_oracle_check.py for the sf10 (100x) proof
sweeps: same gate semantics — per-query row count, column set, and
exact multiset equality of values — but the comparison runs INSIDE
DuckDB (ORDER-insensitive EXCEPT ALL in both directions) instead of
materializing both sides into pandas and stringify-sorting them.
pandas compare is fine at the driver's sf0.01 gate but takes tens of
minutes and ~60 GB on a 60M-row packed frame; EXCEPT ALL streams.

Float handling mirrors the small gate's dtype tolerance (which
stringifies via pandas): a Spark float32 column vs a DuckDB double
recompute must not false-FAIL on representation alone. Scalar
float/double columns are compared as round(CAST(x AS DOUBLE), 6) on
BOTH sides — 6 dp is the surface-wide float-equality contract (every
float-valued oracle already rounds to <= 6 dp by construction, see
BASELINE.md sf1.0 notes). Nested types containing floats are cast to
their DOUBLE-ized type on both sides (exact widening — fixes dtype
coercion without rounding). Everything else compares exactly.
"""
import duckdb, json, sys, glob

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf10"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf10"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
con.sql("SET threads TO 16")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
import time
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING OUTPUT {name}", flush=True); fail += 1; continue
    t0 = time.time()
    try:
        con.sql(f"CREATE OR REPLACE VIEW __got AS SELECT * FROM read_parquet({files!r})")
        con.sql(f"CREATE OR REPLACE VIEW __exp AS ({sql})")
        gtypes = {d[0]: d[1] for d in con.sql("DESCRIBE __got").fetchall()}
        etypes = {d[0]: d[1] for d in con.sql("DESCRIBE __exp").fetchall()}
        gcols, ecols = list(gtypes), list(etypes)
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: columns {sorted(gcols)} vs {sorted(ecols)}", flush=True)
            fail += 1; continue
        SCALAR_NUM = ("FLOAT", "DOUBLE", "REAL", "TINYINT", "SMALLINT",
                      "INTEGER", "BIGINT", "HUGEINT", "UTINYINT",
                      "USMALLINT", "UINTEGER", "UBIGINT")
        def norm(c):
            gt, et = gtypes[c].upper(), etypes[c].upper()
            ts = {gt, et}
            def floaty(t):
                return "FLOAT" in t or "DOUBLE" in t or "REAL" in t
            if not any(floaty(t) for t in ts):
                return f'"{c}"'
            if all(t in SCALAR_NUM for t in ts):
                # at least one scalar side is float-class: widen BOTH to
                # DOUBLE and round. (Deriving the widening from the got
                # side alone could CAST a float expected side to an
                # INTEGER got type, silently rounding a real cross-engine
                # mismatch into a pass.)
                return f'round(CAST("{c}" AS DOUBLE), 6) AS "{c}"'
            # nested type containing floats: exact widening, no rounding —
            # widen from the FLOAT-BEARING side's type so an integer-typed
            # other side is promoted rather than the float side truncated
            src = gt if floaty(gt) else et
            wide = src.replace("FLOAT", "DOUBLE").replace("REAL", "DOUBLE")
            return f'CAST("{c}" AS {wide}) AS "{c}"'
        cols = ", ".join(norm(c) for c in sorted(gcols))
        ng = con.sql("SELECT count(*) FROM __got").fetchone()[0]
        ne = con.sql("SELECT count(*) FROM __exp").fetchone()[0]
        if ng != ne:
            print(f"FAIL {name}: rows {ng} vs {ne}", flush=True); fail += 1; continue
        # multiset equality: equal counts + empty one-directional
        # EXCEPT ALL difference implies equality of both multisets
        d1 = con.sql(f"SELECT count(*) FROM (SELECT {cols} FROM __got "
                     f"EXCEPT ALL SELECT {cols} FROM __exp)").fetchone()[0]
        if d1:
            print(f"FAIL {name}: {d1} rows differ", flush=True); fail += 1; continue
        print(f"OK   {name} ({ng} rows, {time.time()-t0:.1f}s)", flush=True)
        ok += 1
    except Exception as e:
        print(f"ERROR {name}: {e}", flush=True); fail += 1
print(f"\n{ok} ok, {fail} fail", flush=True)
sys.exit(1 if fail else 0)
