#!/usr/bin/env python3
"""Build a UNICODE twin of an sf fixture dir: deterministic multibyte
text (accented Latin at doc_id % 13 = 0, CJK at % 17 = 0, an emoji at
% 19 = 0) appended to documents.text, n_chars recomputed. The shipped
fixtures are pure ASCII, so byte-vs-codepoint divergence between the
engine (UTF-8 byte arithmetic in binary-payload paths) and the oracle
(code-point string functions) was structurally invisible — the r11
sweep caught q30/q47's stub arms summing bytes against an oracle
summing code points. Run the full Verify + check.py gate with this
dir as SFDIR.

Usage: make_unicode.py SRC_SFDIR DST_DIR
"""
import sys, os, shutil
import duckdb

INJECT = """CASE WHEN doc_id % 13 = 0 THEN text || ' café naïve'
     WHEN doc_id % 17 = 0 THEN text || ' 中文 词语'
     WHEN doc_id % 19 = 0 THEN text || ' data🚀x'
     ELSE text END"""


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
        SELECT doc_id, {INJECT} AS text, lang, source,
          CAST(length({INJECT}) AS BIGINT) AS n_chars
        FROM read_parquet('{src}/documents.parquet')
      ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    n = con.execute(
        f"SELECT count(*) FILTER (octet_length(encode(text)) > length(text)), "
        f"count(*) FROM read_parquet('{dst}/documents.parquet')").fetchone()
    print(f"wrote {dst}: {n[0]} of {n[1]} docs carry multibyte text")


if __name__ == "__main__":
    main()
