#!/usr/bin/env python3
"""Build an empty-corpus twin of an sf fixture dir: relational tables
copied, documents + embeddings emptied (schema preserved). At corpus
scale an empty source/filtered subset is a NORMAL input — every catalog
query must degrade to an empty (or degenerate-but-correct) result, not
crash on a missing codebook/centroid head or a NULL global aggregate.
Run the full Verify + check.py gate with the twin as SFDIR.

Usage: make_empty.py SRC_SFDIR DST_DIR [all]

Default mode empties documents + embeddings (the r10 corpus gate).
`all` mode (r11) empties EVERY table — a fully-filtered relational
input is just as normal at scale (an empty partition of a date-pruned
fact table, a new tenant's empty collection), and the relational
surface was still structurally blind to it.
"""
import sys, os, shutil
import duckdb

ALL = ["region", "nation", "customer", "supplier", "part",
       "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    src, dst = sys.argv[1], sys.argv[2]
    empty_all = len(sys.argv) > 3 and sys.argv[3] == "all"
    emptied = ALL if empty_all else ["documents", "embeddings"]
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in ALL:
        p = f"{src}/{t}.parquet"
        if not os.path.exists(p):
            continue
        if t in emptied:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{p}') "
                f"WHERE 1=0) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        else:
            shutil.copyfile(p, f"{dst}/{t}.parquet")
    print(f"wrote {dst}: {'/'.join(emptied)} emptied, schema preserved")

if __name__ == "__main__":
    main()
