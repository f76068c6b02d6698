#!/usr/bin/env python3
"""Build a nullable twin of an sf fixture dir: copies every table and
injects deterministic NULLs into the documents table (text at
doc_id % 37 = 0, lang at % 41 = 0, n_chars at % 43 = 0). The r9 ADVICE
found the shipped fixtures carry no NULLs, so the oracle gate was
structurally blind to NULL-handling divergence between the engines;
running the FULL Verify + check.py gate against this twin closes that
hole (tools/check.py with this dir as SFDIR).

Usage: make_nulls.py SRC_SFDIR DST_DIR
"""
import sys, os, shutil
import duckdb

def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            shutil.copyfile(p, f"{dst}/{t}.parquet")
    con.execute(f"""
        COPY (
          SELECT doc_id,
            CASE WHEN doc_id % 37 = 0 THEN NULL ELSE text END AS text,
            CASE WHEN doc_id % 41 = 0 THEN NULL ELSE lang END AS lang,
            source,
            CASE WHEN doc_id % 43 = 0 THEN NULL ELSE n_chars END AS n_chars
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    n = con.execute(f"SELECT count(*) FILTER (text IS NULL), "
                    f"count(*) FILTER (lang IS NULL), "
                    f"count(*) FILTER (n_chars IS NULL), count(*) "
                    f"FROM read_parquet('{dst}/documents.parquet')").fetchone()
    print(f"wrote {dst}: documents nulls text={n[0]} lang={n[1]} "
          f"n_chars={n[2]} of {n[3]} rows")

if __name__ == "__main__":
    main()
