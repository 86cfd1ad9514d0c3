#!/usr/bin/env python3
"""Deterministic 10x upscale of the driver's sf0.1 tables to a local
"sf1.0" under target/sf1.0 (repo-local; /root/testdata is read-only and
ships no sf1.0). Replication protocol, copy k in 0..9:

- region/nation: copied as-is (dimensions).
- customer/supplier/part/orders/lineitem: primary AND foreign keys offset
  by k * (table's sf0.1 key cardinality), so referential integrity and the
  children-per-parent distribution are preserved exactly; copy 0 IS sf0.1.
- events: event_id/user_id offset; `ts` physical type preserved EXACTLY
  as the source encodes it via pyarrow (the driver regenerated sf0.1
  with TIMESTAMP_MICROS in round 5; a duckdb COPY could silently
  retype). EventStreams.eventMicros adapts to whichever encoding
  arrives, but the generator must stay faithful to the driver's
  current testdata, not assume one.
- documents: doc_id offset; copies k>0 get a " repk<k>" suffix token so
  replicas are NEAR-duplicates (stresses minhash/LSH + connected
  components with 10-doc clusters at full-corpus scale) rather than
  byte-identical; n_chars recomputed.
- embeddings: vec_id offset; copies k>0 rotate the vector by k positions
  (norm-preserving, decorrelates the copy from the original).

The absolute-id-bounded equivalence gates (doc_id<100/1000, vec_id<10/500)
see EXACTLY the sf0.1 subset by construction — their sf1.0 value is that
the full-corpus paths around them (survivor dedup, sampling, packing,
text stats) run at 10x while those gates stay green.
"""
import duckdb
import os
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1.0"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# BASE: how many sf0.1-units the SOURCE already contains. Key offsets are
# k * cardinality(sf0.1 table) * BASE so the protocol composes:
#   sf0.1 -> sf1.0 : BASE=1  (default)
#   sf1.0 -> sf10  : BASE=10 (python3 scripts_make_sf1.py target/sf1.0 target/sf10 10 10)
# Copy 0 stays the identity, so absolute-id-bounded gates see the sf0.1
# subset at EVERY scale. Second-level embedding rotations can coincide
# mod 64 (j + 10k wraps) — duplicate vectors under distinct vec_ids are
# accepted: no gate depends on sf10 vector uniqueness, and real corpora
# carry exact dups anyway.
BASE = int(sys.argv[4]) if len(sys.argv) > 4 else 1

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.sql("SET threads TO 16")


def upscale(table, select_fn):
    parts = " UNION ALL ".join(select_fn(k) for k in range(K))
    con.sql(f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


def copy_asis(table):
    con.sql(f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO "
            f"'{DST}/{table}.parquet' (FORMAT PARQUET)")
    print(f"{table}: copied as-is")


copy_asis("region")
copy_asis("nation")

upscale("customer", lambda k: f"""
  SELECT c_custkey + {k * 15000 * BASE} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet'""")

upscale("supplier", lambda k: f"""
  SELECT s_suppkey + {k * 1000 * BASE} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet'""")

upscale("part", lambda k: f"""
  SELECT p_partkey + {k * 20000 * BASE} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM '{SRC}/part.parquet'""")

upscale("orders", lambda k: f"""
  SELECT o_orderkey + {k * 150000 * BASE} AS o_orderkey,
         o_custkey + {k * 15000 * BASE} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")

upscale("lineitem", lambda k: f"""
  SELECT l_orderkey + {k * 150000 * BASE} AS l_orderkey,
         l_partkey + {k * 20000 * BASE} AS l_partkey,
         l_suppkey + {k * 1000 * BASE} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet'""")

upscale("documents", lambda k: f"""
  SELECT doc_id + {k * 5000 * BASE} AS doc_id,
         {'text' if k == 0 else f"text || ' repk{k}'"} AS text,
         lang, source,
         {'n_chars' if k == 0 else f"length(text || ' repk{k}')"} AS n_chars
  FROM '{SRC}/documents.parquet'""")

# embeddings: rotate by k (1-indexed duckdb list slicing); FLOAT[] type is
# preserved by casting the rebuilt list back
upscale("embeddings", lambda k: f"""
  SELECT vec_id + {k * 2000 * BASE} AS vec_id,
         CAST({'embedding' if k == 0 else
               f'embedding[{(k * BASE) % 64 + 1}:64] || embedding[1:{(k * BASE) % 64}]'}
              AS FLOAT[]) AS embedding,
         label
  FROM '{SRC}/embeddings.parquet'""")

# events via pyarrow: preserve the source's exact ts physical type
# (duckdb COPY normalizes timestamps to micros — harmless today, but the
# generator must not re-encode what the driver ships)
tbl = pq.read_table(f"{SRC}/events.parquet")
batches = []
for k in range(K):
    t = tbl
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                     pc.add(t.column("event_id"), 100000 * k * BASE))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pc.add(t.column("user_id"), 1500 * k * BASE))
    batches.append(t)
import pyarrow as pa  # noqa: E402
out = pa.concat_tables(batches)
pq.write_table(out, f"{DST}/events.parquet")
print(f"events: {out.num_rows} rows, ts type {out.schema.field('ts').type}")
print("done ->", DST)
