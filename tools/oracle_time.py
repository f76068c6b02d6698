#!/usr/bin/env python3
"""Time oracle SQL in DuckDB against an SF dir, best-of-N — the DuckDB
side of the salted scale-up protocol (same SQL both engines, 32 threads,
sequential runs). Reads oracle_sql.json from a graft.Verify OUTDIR.

Usage: oracle_time.py SFDIR ORACLE_JSON_DIR N name...
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, outdir, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for name in names:
        times = []
        for _ in range(n):
            t0 = time.time()
            con.execute(oracle[name]).fetchall()
            times.append(time.time() - t0)
        print(f"DUCK {name:26s} " + " ".join(f"{t:.2f}" for t in times))


if __name__ == "__main__":
    main()
