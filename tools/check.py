#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output in
OUTDIR (written by graft.Verify), run the matching oracle SQL from
oracle_sql.json in DuckDB against the SFDIR parquet tables, sort columns by
name, sort rows, and compare values. Usage: check.py SFDIR OUTDIR [names...]
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        resdir = os.path.join(outdir, name)
        if not os.path.isdir(resdir):
            print(f"MISS {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{resdir}/*.parquet')")
            sp_rows, sp_cols = sp.fetchall(), [d[0] for d in sp.description]
            du = con.execute(oracle[name])
            du_rows, du_cols = du.fetchall(), [d[0] for d in du.description]
            # Type gate: the driver's hasher renders oracle values through
            # column TYPES, so a values-equal result can still hash-mismatch.
            # Two classes this replica must reject loudly (the r9 q106
            # lesson — an uncast HUGEINT window-sum derivative was the only
            # red driver row while this script's int-stringification
            # passed it):
            #   1. HUGEINT/UHUGEINT oracle columns (DuckDB sum(BIGINT) et
            #      al.) — the driver coerces them via float64.
            #   2. float-typed oracle columns where the Spark side is
            #      integral — repr(float) vs str(int) diverge.
            sp_ty = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{resdir}/*.parquet')"
            ).fetchall()}
            du_ty = {r[0]: r[1]
                     for r in con.execute(f"DESCRIBE {oracle[name]}").fetchall()}
            INTEGRAL = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
            FLOATY = {"FLOAT", "DOUBLE", "REAL"}
            ty_bad = []
            for c, t in du_ty.items():
                if t in ("HUGEINT", "UHUGEINT"):
                    ty_bad.append(f"{c}: oracle {t} (CAST it to BIGINT)")
                elif t in FLOATY and sp_ty.get(c) in INTEGRAL:
                    ty_bad.append(
                        f"{c}: oracle {t} but spark {sp_ty.get(c)}")
            for c, t in sp_ty.items():
                if t in FLOATY and du_ty.get(c) in INTEGRAL:
                    ty_bad.append(f"{c}: spark {t} but oracle {du_ty.get(c)}")
            if ty_bad:
                print(f"FAIL {name}: result types unsafe for the driver "
                      f"hasher: {'; '.join(ty_bad)}")
                n_fail += 1
                continue
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_fail += 1
            continue
        if sorted(sp_cols) != sorted(du_cols):
            print(f"FAIL {name}: cols spark={sorted(sp_cols)} duck={sorted(du_cols)}")
            n_fail += 1
            continue
        a, b = canon(sp_rows, sp_cols), canon(du_rows, du_cols)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
        elif a != b:
            bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL {name}: values differ at sorted row {bad}:")
            print(f"  spark: {a[bad][:300]}")
            print(f"  duck : {b[bad][:300]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
