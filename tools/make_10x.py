#!/usr/bin/env python3
"""Synthesize a 10x copy of sf0.1 into OUT (default /tmp/sf1x10) for the
scale experiment (SURVEY 'Scale experiment' section). Ten shifted copies:
ids offset per copy so joins/dedup behave realistically; documents/
embeddings keep their text/vectors VERBATIM per copy (10-way duplication
stress-tests dedup canonicalization, which is the point). events must go
through pyarrow with coerce_timestamps=None -- DuckDB COPY silently
rewrites TIMESTAMP(NANOS) to us and every ts query then hash-fails.
"""
import sys, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x10"
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

def copy_small(name):  # dimension tables: one copy, unchanged
    con.execute(f"COPY (SELECT * FROM '{SRC}/{name}.parquet') TO '{OUT}/{name}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 200000)")

def copy_10x(name, sql_per_copy):
    parts = " UNION ALL ".join(sql_per_copy(k) for k in range(10))
    con.execute(f"COPY ({parts}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 500000)")

for t in ("region", "nation"):
    copy_small(t)

copy_10x("customer", lambda k: f"SELECT * REPLACE (c_custkey + {k}*1000000 AS c_custkey) FROM '{SRC}/customer.parquet'")
copy_10x("supplier", lambda k: f"SELECT * REPLACE (s_suppkey + {k}*1000000 AS s_suppkey) FROM '{SRC}/supplier.parquet'")
copy_10x("part", lambda k: f"SELECT * REPLACE (p_partkey + {k}*1000000 AS p_partkey) FROM '{SRC}/part.parquet'")
copy_10x("orders", lambda k: f"SELECT * REPLACE (o_orderkey + {k}*10000000 AS o_orderkey, o_custkey + {k}*1000000 AS o_custkey) FROM '{SRC}/orders.parquet'")
copy_10x("lineitem", lambda k: f"SELECT * REPLACE (l_orderkey + {k}*10000000 AS l_orderkey, l_partkey + {k}*1000000 AS l_partkey, l_suppkey + {k}*1000000 AS l_suppkey) FROM '{SRC}/lineitem.parquet'")
copy_10x("documents", lambda k: f"SELECT * REPLACE (doc_id + {k}*1000000 AS doc_id) FROM '{SRC}/documents.parquet'")
copy_10x("embeddings", lambda k: f"SELECT * REPLACE (vec_id + {k}*1000000 AS vec_id) FROM '{SRC}/embeddings.parquet'")

# events via pyarrow to preserve TIMESTAMP(NANOS)
tbl = pq.read_table(f"{SRC}/events.parquet")
copies = []
for k in range(10):
    t = tbl
    eid = pa.compute.add(t.column("event_id"), k * 10000000)
    uid = pa.compute.add(t.column("user_id"), k * 1000000)
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id", eid)
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id", uid)
    copies.append(t)
big = pa.concat_tables(copies)
pq.write_table(big, f"{OUT}/events.parquet", coerce_timestamps=None, row_group_size=1000000)
print("schema check:", pq.read_schema(f"{OUT}/events.parquet"))
for f in sorted(os.listdir(OUT)):
    print(f, os.path.getsize(os.path.join(OUT, f)))
