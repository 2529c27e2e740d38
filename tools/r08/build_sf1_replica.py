"""Deterministic 10x replica of sf0.1 for PERF validation at the driver's
sf1.0 scale (measurement-only; never used by bench.py or the oracle gate).

Replica r in 0..9 shifts every key family by r * OFFSET so joins stay
consistent; replica 0 is sf0.1 verbatim.  Mutations keep workload shape
realistic instead of pathological:

* documents.text: for r > 0, every 24th word is replaced by a
  replica-unique token, so MOST 8-gram windows still duplicate across
  replicas (16/24 of starts) but not all — mirrors the BASELINE.md r7
  replica's "cross-replica dup grams" property.
* embeddings: vec_id shifted; vectors unchanged (cosine workload shape
  is cluster-bounded either way).
* events: ids/user ids shifted, ts shifted r seconds to break exact ties.
* nation/region: fixed dimension tables, copied once.

Usage: python tools/r08/build_sf1_replica.py [/tmp/spark_graft_sf1]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"

O_ORDER = 10_000_000
O_CUST = 1_000_000
O_PART = 1_000_000
O_SUPP = 100_000
O_DOC = 1_000_000
O_VEC = 1_000_000
O_EVENT = 10_000_000
O_USER = 1_000_000

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.sql("SET threads TO 16")
con.sql("CREATE TABLE reps AS SELECT unnest(generate_series(0, 9)) AS r")


def build(name: str, select_sql: str) -> None:
    dst = f"{OUT}/{name}.parquet"
    if os.path.exists(dst):
        print(f"skip {name} (exists)")
        return
    con.sql(
        f"COPY ({select_sql}) TO '{dst}' (FORMAT PARQUET, COMPRESSION ZSTD)"
    )
    n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
    print(f"{name}: {n} rows")


build("orders", f"""
SELECT o_orderkey + r * {O_ORDER} AS o_orderkey,
       o_custkey + r * {O_CUST} AS o_custkey,
       o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM '{SRC}/orders.parquet', reps""")

build("lineitem", f"""
SELECT l_orderkey + r * {O_ORDER} AS l_orderkey,
       l_partkey + r * {O_PART} AS l_partkey,
       l_suppkey + r * {O_SUPP} AS l_suppkey,
       l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
       l_returnflag, l_linestatus, l_shipdate
FROM '{SRC}/lineitem.parquet', reps""")

build("customer", f"""
SELECT c_custkey + r * {O_CUST} AS c_custkey,
       c_name || '#r' || r AS c_name, c_nationkey, c_acctbal, c_mktsegment
FROM '{SRC}/customer.parquet', reps""")

build("supplier", f"""
SELECT s_suppkey + r * {O_SUPP} AS s_suppkey,
       s_name || '#r' || r AS s_name, s_nationkey, s_acctbal
FROM '{SRC}/supplier.parquet', reps""")

build("part", f"""
SELECT p_partkey + r * {O_PART} AS p_partkey,
       p_name, p_brand, p_type, p_size, p_retailprice
FROM '{SRC}/part.parquet', reps""")

build("documents", f"""
SELECT doc_id + r * {O_DOC} AS doc_id,
       CASE WHEN r = 0 THEN text ELSE
         array_to_string(
           list_transform(string_split(text, ' '),
             (w, i) -> CASE WHEN (i - 1) % 24 = 0
                            THEN 'r' || r || 'w' || i ELSE w END),
           ' ')
       END AS text,
       lang, source, n_chars
FROM '{SRC}/documents.parquet', reps""")

build("embeddings", f"""
SELECT vec_id + r * {O_VEC} AS vec_id, embedding, label
FROM '{SRC}/embeddings.parquet', reps""")

build("events", f"""
SELECT event_id + r * {O_EVENT} AS event_id,
       ts + to_seconds(r) AS ts,
       user_id + r * {O_USER} AS user_id,
       event_type, value, props
FROM '{SRC}/events.parquet', reps""")

build("nation", f"SELECT * FROM '{SRC}/nation.parquet'")
build("region", f"SELECT * FROM '{SRC}/region.parquet'")

open(f"{OUT}/_DONE", "w").write("ok\n")
print("replica complete:", OUT)
