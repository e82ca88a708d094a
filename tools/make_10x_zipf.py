#!/usr/bin/env python3
"""Zipf-skew variant of the 10x scale corpus (SURVEY 'Scale experiment'):
same ~10x volume as tools/make_10x.py, but duplication is CONCENTRATED
instead of uniform, to exercise the skew paths the uniform corpus never
stresses (SkewAgg salted groupBy, AQE skew joins, dedup bucket caps on a
boilerplate digest):

- events: copy 0 keeps its event_type mix; copies 1..9 rewrite event_type
  to a hot metric chosen harmonically (zipf-ish): zipf.0 gets 5 copies,
  zipf.1 gets 2, zipf.2/3/4 get 1 each -- so one groupBy key holds ~half
  the 10x corpus and the rollup's hot (metric, slot) groups serialize on
  one reducer unless salting spreads them.
- documents: copy 0 verbatim; copies 1..9 REPLACE each row's text with the
  text of one of 32 "boilerplate" docs, picked by a zipf-shaped lookup
  (rank 0 gets 1/2 of rewrites, rank 1 a quarter, ...), ids still offset
  per copy. Exact/near-dup digests now have a handful of keys carrying
  ~90% of the corpus -- the hot-digest case dedup's groupBys must survive.
- embeddings: same zipf rewrite over 32 hot vectors (semantic-dedup /
  kmeans canonicalization stress: a few reps with huge multiplicities).
- TPC-H tables + nation/region copy through unchanged-shape (uniform 10x,
  as before) so join queries still run.

events must go through pyarrow with coerce_timestamps=None -- DuckDB COPY
silently rewrites TIMESTAMP(NANOS) to us and every ts query hash-fails.
"""
import sys, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x10z"
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

# harmonic copy->hot-metric assignment: 5,2,1,1,1 copies for ranks 0..4
HOT_METRIC = {1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 6: 1, 7: 1, 8: 2, 9: 3}
# zipf-shaped 32-slot lookup: rank r covers 2^-(r+1) of rewrites (tail padded)
ZIPF32 = [0] * 16 + [1] * 8 + [2] * 4 + [3] * 2 + [4] + [5]


def copy_small(name):
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

# hot-digest documents: copies 1..9 take the text of one of 32 boilerplate
# docs (zipf-shaped by doc_id mod 32); the join is tiny (32 rows broadcast)
zipf_case = "CASE doc_id % 32 " + " ".join(
    f"WHEN {m} THEN {r}" for m, r in enumerate(ZIPF32)) + " END"
con.execute(f"CREATE TEMP TABLE hot_docs AS SELECT row_number() OVER (ORDER BY doc_id) - 1 AS hot_rank, text AS hot_text FROM (SELECT doc_id, text FROM '{SRC}/documents.parquet' ORDER BY doc_id LIMIT 32)")
copy_10x("documents", lambda k: (
    f"SELECT * REPLACE (doc_id + {k}*1000000 AS doc_id) FROM '{SRC}/documents.parquet'" if k == 0 else
    f"SELECT d.* REPLACE (d.doc_id + {k}*1000000 AS doc_id, h.hot_text AS text) "
    f"FROM '{SRC}/documents.parquet' d JOIN hot_docs h ON h.hot_rank = {zipf_case}"))

con.execute(f"CREATE TEMP TABLE hot_vecs AS SELECT row_number() OVER (ORDER BY vec_id) - 1 AS hot_rank, embedding AS hot_v FROM (SELECT vec_id, embedding FROM '{SRC}/embeddings.parquet' ORDER BY vec_id LIMIT 32)")
zipf_case_v = zipf_case.replace("doc_id", "vec_id")
copy_10x("embeddings", lambda k: (
    f"SELECT * REPLACE (vec_id + {k}*1000000 AS vec_id) FROM '{SRC}/embeddings.parquet'" if k == 0 else
    f"SELECT e.* REPLACE (e.vec_id + {k}*1000000 AS vec_id, h.hot_v AS embedding) "
    f"FROM '{SRC}/embeddings.parquet' e JOIN hot_vecs h ON h.hot_rank = {zipf_case_v}"))

# events via pyarrow to preserve TIMESTAMP(NANOS); hot metric via dict swap
tbl = pq.read_table(f"{SRC}/events.parquet")
copies = []
for k in range(10):
    t = tbl
    eid = pa.compute.add(t.column("event_id"), k * 10000000)
    uid = pa.compute.add(t.column("user_id"), k * 1000000)
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id", eid)
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id", uid)
    if k > 0:
        hot = pa.array([f"zipf.{HOT_METRIC[k]}"] * len(t),
                       type=t.column("event_type").type)
        t = t.set_column(t.schema.get_field_index("event_type"), "event_type", hot)
    copies.append(t)
big = pa.concat_tables(copies)
pq.write_table(big, f"{OUT}/events.parquet", coerce_timestamps=None, row_group_size=1000000)
print("schema check:", pq.read_schema(f"{OUT}/events.parquet"))
print(con.execute(f"SELECT event_type, count(*) FROM '{OUT}/events.parquet' GROUP BY 1 ORDER BY 2 DESC LIMIT 8").fetchall())
print(con.execute(f"SELECT count(*) AS rows, count(DISTINCT text) AS texts FROM '{OUT}/documents.parquet'").fetchall())
for f in sorted(os.listdir(OUT)):
    print(f, os.path.getsize(os.path.join(OUT, f)))
