#!/usr/bin/env python3
"""Salted scale-up fixtures (the PLANS_r07 protocol, now a tool):
disjoint copies of an SF dir's documents/embeddings tables.

- documents: copy i offsets doc_id by i*10M and suffixes every token
  with `_s<i>` (copy 0 verbatim), so token/shingle df distributions are
  scale-invariant — duplicate RATES stay constant as the corpus grows.
  n_chars is recomputed for salted copies.
- embeddings: copy i offsets vec_id by i*10M and perturbs each float by
  a small deterministic value-dependent amount (copy 0 verbatim), so
  within-copy cosine structure is preserved but copies are not
  bit-identical.
- every other table is symlinked from the source dir so engine warmups
  and unrelated Tables.* loads resolve.
- both written tables use ROW_GROUP_SIZE 8192: parquet scans (Spark AND
  DuckDB) parallelize at row-group granularity, and DuckDB's default
  122880-row groups left a 50K-doc fixture with ONE row group — every
  corpus pass measured on such a fixture is a single-thread scan no
  matter the engine, which models nothing about a 100 TB corpus
  (millions of row groups). Small groups make the scale ratios measure
  the engines, not the writer's defaults.

Usage: make_scale.py SFDIR OUTDIR FACTOR [salt-lineitem]

The optional `salt-lineitem` mode also salts lineitem (copy i offsets
l_orderkey by i*10M, matching the salted orders copies so referential
structure is preserved): the DEPLOYMENT shape of the q117 fk audit has
the CHILD as the big side (a 100 TB lakehouse fact table referencing a
much smaller dimension), whereas the default fixture inverts it (15M
salted parent keys vs a symlinked 600K-row child) — the r10 verdict's
open `weak`. Off by default so q105/q113 measurements stay comparable
with earlier rounds' ledgers.
"""
import os
import sys

import duckdb


def main():
    sfdir, outdir, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    salt_lineitem = len(sys.argv) > 4 and sys.argv[4] == "salt-lineitem"
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    salted = ("CASE WHEN c.i = 0 OR d.text IS NULL OR d.text = '' THEN d.text "
              "ELSE replace(d.text, ' ', '_s' || c.i || ' ') || '_s' || c.i END")
    con.execute(f"""
      COPY (
        SELECT d.doc_id + c.i * 10000000 AS doc_id,
               {salted} AS text,
               d.lang, d.source,
               CAST(coalesce(length({salted}), d.n_chars) AS BIGINT) AS n_chars
        FROM read_parquet('{sfdir}/documents.parquet') d, range({factor}) c(i)
        ORDER BY doc_id
      ) TO '{outdir}/documents.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 8192)""")
    con.execute(f"""
      COPY (
        SELECT e.vec_id + c.i * 10000000 AS vec_id,
               CASE WHEN c.i = 0 THEN e.embedding
                    ELSE list_transform(e.embedding,
                      x -> CAST(x + 0.0005 * c.i * sin(x * 97.0) AS FLOAT))
               END AS embedding,
               e.label
        FROM read_parquet('{sfdir}/embeddings.parquet') e, range({factor}) c(i)
        ORDER BY vec_id
      ) TO '{outdir}/embeddings.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 8192)""")
    # orders: copy i offsets o_orderkey by i*10M, everything else verbatim
    # — the CDC-merge measurements (q105) key on o_orderkey, and a
    # symlinked orders table would leave their input FIXED at every
    # factor (measuring nothing about scale).
    con.execute(f"""
      COPY (
        SELECT o.* REPLACE (o.o_orderkey + c.i * 10000000 AS o_orderkey)
        FROM read_parquet('{sfdir}/orders.parquet') o, range({factor}) c(i)
        ORDER BY o_orderkey
      ) TO '{outdir}/orders.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 8192)""")
    # events: copy i offsets event_id and user_id per copy (disjoint user
    # populations, same temporal shape) — event-stream audits (q114,
    # q63/q72/q73) need an input that actually grows with the factor.
    con.execute(f"""
      COPY (
        SELECT e.* REPLACE (e.event_id + c.i * 10000000 AS event_id,
                            e.user_id + c.i * 1000000 AS user_id)
        FROM read_parquet('{sfdir}/events.parquet') e, range({factor}) c(i)
        ORDER BY event_id
      ) TO '{outdir}/events.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 8192)""")
    if salt_lineitem:
        # child copies reference their own orders copy: l_orderkey gets
        # the SAME per-copy offset as o_orderkey above, so the fk
        # relationship is intact per copy and the ~2% corruption the
        # audit injects stays the only orphan source
        con.execute(f"""
          COPY (
            SELECT l.* REPLACE (l.l_orderkey + c.i * 10000000 AS l_orderkey)
            FROM read_parquet('{sfdir}/lineitem.parquet') l, range({factor}) c(i)
            ORDER BY l_orderkey
          ) TO '{outdir}/lineitem.parquet'
            (FORMAT PARQUET, ROW_GROUP_SIZE 8192)""")
    symlinked = ["region", "nation", "customer", "supplier", "part"]
    if not salt_lineitem:
        symlinked.append("lineitem")
    for t in symlinked:
        src, dst = f"{sfdir}/{t}.parquet", f"{outdir}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(os.path.abspath(src), dst)
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{outdir}/documents.parquet')"
    ).fetchone()[0]
    print(f"wrote {outdir}: {n} docs ({factor}x)")


if __name__ == "__main__":
    main()
