#!/usr/bin/env python3
"""100x relational corpus for the iterative-query crossover (round-10
verdict item #1): 100 key-shifted copies of sf0.1's orders + lineitem so
the customer->supplier graph behind graph_pagerank really grows 100x in
nodes AND edges (offsets keep each copy's keys disjoint — 1.5M customers,
100k suppliers, 60M lineitem rows, ~15M distinct edges).

Other tables are copied verbatim so the directory is a drop-in
SPARK_GRAFT_SF_DIR for the graph/relational queries under test. Both
engines read the same parquet files; column pruning means each reads only
the two key columns either way, so full-width tables cost disk, not
fairness.
"""
import os, shutil, sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfrel100x"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 100
os.makedirs(OUT, exist_ok=True)

for t in "region nation customer supplier part events documents embeddings".split():
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

con = duckdb.connect()

OK, CK, SK = 10_000_000, 1_000_000, 1_000_000  # per-copy key offsets

orders = " UNION ALL ".join(
    f"SELECT * REPLACE (o_orderkey + {k*OK} AS o_orderkey, "
    f"o_custkey + {k*CK} AS o_custkey) "
    f"FROM read_parquet('{SRC}/orders.parquet')" for k in range(COPIES))
con.execute(f"COPY ({orders}) TO '{OUT}/orders.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 1000000)")

li = " UNION ALL ".join(
    f"SELECT * REPLACE (l_orderkey + {k*OK} AS l_orderkey, "
    f"l_suppkey + {k*SK} AS l_suppkey) "
    f"FROM read_parquet('{SRC}/lineitem.parquet')" for k in range(COPIES))
con.execute(f"COPY ({li}) TO '{OUT}/lineitem.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 1000000)")

print(con.execute(f"""
  SELECT (SELECT count(*) FROM read_parquet('{OUT}/orders.parquet')) AS orders,
         (SELECT count(*) FROM read_parquet('{OUT}/lineitem.parquet')) AS lineitem,
         (SELECT count(DISTINCT (o_custkey, l_suppkey))
            FROM read_parquet('{OUT}/orders.parquet') o
            JOIN read_parquet('{OUT}/lineitem.parquet') l
              ON o_orderkey = l_orderkey) AS edges""").fetchall())
