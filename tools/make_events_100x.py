#!/usr/bin/env python3
"""100x time-extended events corpus (round-8 verdict item #6): 100 copies
of sf0.1's events, each shifted one 31-day month further into the PAST, so
the recent window the fetch-shaped ts_* queries read is untouched while
total history grows 100x. Fetch cost must track the ROLLUP/window size,
not raw history — this corpus is what proves (or falsifies) that.

Other tables are copied verbatim so the directory is a drop-in
SPARK_GRAFT_SF_DIR. Events go through pyarrow so the timestamp[us]
encoding survives byte-identically.
"""
import os, shutil, sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/events100x"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 100
os.makedirs(OUT, exist_ok=True)

for t in ("region nation customer supplier part orders lineitem "
          "documents embeddings").split():
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

con = duckdb.connect()
parts = " UNION ALL ".join(
    f"SELECT event_id + {k}*10000000000 AS event_id, "
    f"ts - INTERVAL {k*31} DAY AS ts, user_id, event_type, value, props "
    f"FROM read_parquet('{SRC}/events.parquet')"
    for k in range(COPIES))
con.execute(
    f"COPY ({parts}) TO '{OUT}/events.parquet' "
    f"(FORMAT PARQUET, ROW_GROUP_SIZE 1000000)")
n = con.execute(f"SELECT count(*), min(ts), max(ts) FROM read_parquet('{OUT}/events.parquet')").fetchall()
print("events100x:", n)
