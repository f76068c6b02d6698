#!/usr/bin/env python3
"""Build a 90%-hot skew twin of an sf (or scaled) fixture dir — the
r10-verdict protocol for auditing Window.partitionBy consumers: a
window partition key CANNOT be split across tasks (unlike groupBy,
which map-side-combines, or joins, which AQE skew-splits), so a query
whose wall-time tracks the largest key serializes on a hot key at
100 TB. This twin concentrates ~90% of rows onto ONE key for the two
corpus-scale window families:

 - events.user_id -> user 1 for event_id % 10 != 0 (q18 sessionize,
   q38 as-of, q72 funnel, q114 disorder audit);
 - documents.lang -> 'hot' for doc_id % 10 != 0 (q46 stratified
   sample, q50 sequence packing).

Everything else symlinks. Results CHANGE vs the source fixture (keys
moved) — this is a Spark-vs-Spark perf twin (skewed vs unskewed
wall-time), not an oracle fixture.

Usage: make_skew.py SRC_DIR DST_DIR
"""
import os
import sys

import duckdb


def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
      COPY (
        SELECT * REPLACE (
          CASE WHEN event_id % 10 <> 0 THEN 1 ELSE user_id END AS user_id)
        FROM read_parquet('{src}/events.parquet')
      ) TO '{dst}/events.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 8192)""")
    con.execute(f"""
      COPY (
        SELECT * REPLACE (
          CASE WHEN doc_id % 10 <> 0 THEN 'hot' ELSE lang END AS lang)
        FROM read_parquet('{src}/documents.parquet')
      ) TO '{dst}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 8192)""")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"]:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        if os.path.exists(s) and not os.path.exists(d):
            os.symlink(os.path.abspath(s), d)
    hot_u, n_e = con.execute(
        f"SELECT count(*) FILTER (user_id = 1), count(*) "
        f"FROM read_parquet('{dst}/events.parquet')").fetchone()
    hot_l, n_d = con.execute(
        f"SELECT count(*) FILTER (lang = 'hot'), count(*) "
        f"FROM read_parquet('{dst}/documents.parquet')").fetchone()
    print(f"wrote {dst}: events {hot_u}/{n_e} on user 1, "
          f"documents {hot_l}/{n_d} in lang 'hot'")


if __name__ == "__main__":
    main()
