#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing testdata dir by
replicating each table K times with consistently shifted keys (driver-side
tooling — the library never sees this script).

Usage: make_sfN.py <srcSfDir> <dstDir> <K>

Replica k = 0 is the identity, so any entry pinned to specific ids
(e.g. r47's user 3) still finds them. Foreign keys shift together
(o_custkey with c_custkey etc.) so joins stay consistent per replica.
Document text gets a per-replica suffix token (n_chars recomputed) and
embeddings a tiny deterministic first-component nudge, so replicas are
near- but not exact duplicates — otherwise every similarity op
degenerates to ties on identical payloads.
"""
import sys
import duckdb

src, dst, K = sys.argv[1], sys.argv[2], int(sys.argv[3])
con = duckdb.connect()
import os
os.makedirs(dst, exist_ok=True)

def copy(table):
    con.execute(f"COPY (SELECT * FROM '{src}/{table}.parquet') "
                f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)")

def repl(table, select):
    parts = " UNION ALL ".join(
        select.format(k=k) + f" FROM '{src}/{table}.parquet'"
        for k in range(K))
    con.execute(f"COPY ({parts}) TO '{dst}/{table}.parquet' "
                f"(FORMAT PARQUET)")

E = con.sql(f"SELECT max(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
U = con.sql(f"SELECT max(user_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
D = con.sql(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
V = con.sql(f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
O = con.sql(f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]
C = con.sql(f"SELECT max(c_custkey)+1 FROM '{src}/customer.parquet'").fetchone()[0]
S = con.sql(f"SELECT max(s_suppkey)+1 FROM '{src}/supplier.parquet'").fetchone()[0]
P = con.sql(f"SELECT max(p_partkey)+1 FROM '{src}/part.parquet'").fetchone()[0]

copy("region")
copy("nation")
# ts must stay TIMESTAMP(NANOS) in the parquet footer — Spark reads the
# source files with nanosAsLong; a micros column would silently shift
# every derived timestamp by 1000x
repl("events",
     f"SELECT event_id + {{k}}*{E} AS event_id, ts::TIMESTAMP_NS AS ts, "
     f"user_id + {{k}}*{U} AS user_id, event_type, value, props")
repl("documents",
     "SELECT doc_id + {k}*%d AS doc_id, "
     "CASE WHEN {k} = 0 THEN text ELSE text || ' r{k}' END AS text, "
     "lang, source, "
     # n_chars tracks the actual suffix length (' r10' is 4 chars)
     "CASE WHEN {k} = 0 THEN n_chars "
     "ELSE n_chars + length(' r{k}') END AS n_chars" % D)
repl("embeddings",
     f"SELECT vec_id + {{k}}*{V} AS vec_id, "
     f"CAST(list_prepend(embedding[1] + {{k}}*1e-4, embedding[2:]) "
     f"AS FLOAT[]) AS embedding, label")
repl("lineitem",
     f"SELECT l_orderkey + {{k}}*{O} AS l_orderkey, "
     f"l_partkey + {{k}}*{P} AS l_partkey, "
     f"l_suppkey + {{k}}*{S} AS l_suppkey, l_linenumber, l_quantity, "
     f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
     f"l_shipdate")
repl("orders",
     f"SELECT o_orderkey + {{k}}*{O} AS o_orderkey, "
     f"o_custkey + {{k}}*{C} AS o_custkey, o_orderstatus, o_totalprice, "
     f"o_orderdate, o_orderpriority")
repl("customer",
     f"SELECT c_custkey + {{k}}*{C} AS c_custkey, c_name, c_nationkey, "
     f"c_acctbal, c_mktsegment")
repl("supplier",
     f"SELECT s_suppkey + {{k}}*{S} AS s_suppkey, s_name, s_nationkey, "
     f"s_acctbal")
repl("part",
     f"SELECT p_partkey + {{k}}*{P} AS p_partkey, p_name, p_brand, "
     f"p_type, p_size, p_retailprice")

# DuckDB's parquet writer emits TIMESTAMP(MICROS); the source events
# file is TIMESTAMP(NANOS) and the Spark reader depends on that
# physical type (nanosAsLong) — rewrite the column via pyarrow
import pyarrow as pa
import pyarrow.parquet as pq
t = pq.read_table(f"{dst}/events.parquet")
i = t.schema.get_field_index("ts")
t = t.set_column(i, "ts", t.column("ts").cast(pa.timestamp("ns")))
pq.write_table(t, f"{dst}/events.parquet")

for t in ["events", "documents", "embeddings", "lineitem", "orders",
          "customer", "supplier", "part", "nation", "region"]:
    n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(t, n)
