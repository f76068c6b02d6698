#!/usr/bin/env python3
"""Build an empty-corpus twin of an sf fixture dir: relational tables
copied, documents + embeddings emptied (schema preserved). At corpus
scale an empty source/filtered subset is a NORMAL input — every catalog
query must degrade to an empty (or degenerate-but-correct) result, not
crash on a missing codebook/centroid head or a NULL global aggregate.
Run the full Verify + check.py gate with the twin as SFDIR.

Usage: make_empty.py SRC_SFDIR DST_DIR
"""
import sys, os, shutil
import duckdb

def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            shutil.copyfile(p, f"{dst}/{t}.parquet")
    for t in ["documents", "embeddings"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') "
            f"WHERE 1=0) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    print(f"wrote {dst}: documents/embeddings emptied, schema preserved")

if __name__ == "__main__":
    main()
