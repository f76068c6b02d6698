#!/usr/bin/env python3
"""Build a SINGLETON twin of an sf fixture dir: exactly one row per
table (LIMIT 1, schema kept). Between the empty twin (zero rows) and
the standard fixtures (plenty) lies the n=1 regime that degenerate-
input bugs love: codebooks smaller than their K (the r11 sweep caught
the PQ codebook refusing a 1-vector corpus the oracle happily computes
with), single-doc LSH bands, 1-row quantiles/histograms. Run the full
Verify + check.py gate with this dir as SFDIR.

Usage: make_single.py SRC_SFDIR DST_DIR
"""
import sys, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"COPY (SELECT * FROM read_parquet('{p}') LIMIT 1) "
                        f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    print(f"wrote {dst}: one row per table")


if __name__ == "__main__":
    main()
