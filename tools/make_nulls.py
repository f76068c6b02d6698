#!/usr/bin/env python3
"""Build a nullable twin of an sf fixture dir: copies every table and
injects deterministic NULLs into the nullable columns of EVERY table —
documents (r10) plus lineitem/orders/customer/events (r11, closing the
relational surface's structural blindness the r10 verdict flagged).

Key/identity columns (doc_id, vec_id, *_key, event_id, user_id,
l_linenumber) stay NOT NULL: they are the PK/FK identity a real schema
constrains, and nulling join keys would make oracle comparisons hinge
on NOT-IN-vs-NOT-EXISTS trivia rather than engine behavior. Everything
else is nulled on disjoint deterministic residues so most rows keep
most columns (realistic sparse nulls, not a degenerate all-null table).

Run the FULL Verify + check.py gate against this twin
(tools/check.py with this dir as SFDIR).

Usage: make_nulls.py SRC_SFDIR DST_DIR
"""
import sys, os, shutil
import duckdb


def nullify(col, key, mod):
    return f"CASE WHEN ({key}) % {mod} = 0 THEN NULL ELSE {col} END AS {col}"


# per-table: (key expression, [(column, modulus), ...]) — moduli are
# distinct primes per column so null patterns don't correlate
SPECS = {
    "documents": ("doc_id", [("text", 37), ("lang", 41), ("n_chars", 43)]),
    "customer": ("c_custkey", [("c_name", 31), ("c_nationkey", 29),
                               ("c_acctbal", 23), ("c_mktsegment", 19)]),
    "orders": ("o_orderkey", [("o_orderstatus", 37), ("o_totalprice", 23),
                              ("o_orderdate", 29), ("o_orderpriority", 31)]),
    "lineitem": ("l_orderkey * 8 + l_linenumber",
                 [("l_quantity", 23), ("l_extendedprice", 29),
                  ("l_discount", 31), ("l_tax", 37), ("l_returnflag", 41),
                  ("l_linestatus", 43), ("l_shipdate", 47)]),
    "events": ("event_id", [("ts", 53), ("event_type", 29),
                            ("value", 23), ("props", 31)]),
}


def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation", "supplier", "part", "embeddings"]:
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            shutil.copyfile(p, f"{dst}/{t}.parquet")
    for t, (key, cols) in SPECS.items():
        p = f"{src}/{t}.parquet"
        if not os.path.exists(p):
            continue
        all_cols = [d[0] for d in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{p}')").fetchall()]
        nulled = {c: m for c, m in cols}
        sel = ", ".join(
            nullify(c, key, nulled[c]) if c in nulled else c
            for c in all_cols)
        con.execute(f"COPY (SELECT {sel} FROM read_parquet('{p}')) "
                    f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        stats = con.execute(
            "SELECT " + ", ".join(
                f"count(*) FILTER ({c} IS NULL)" for c, _ in cols) +
            f", count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()
        desc = " ".join(f"{c}={n}" for (c, _), n in zip(cols, stats))
        print(f"  {t}: nulls {desc} of {stats[-1]} rows")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
