#!/usr/bin/env python3
"""Offline PCA-rotation trainer for the q120 prefix-recall audit.

Computes the top-16 principal axes of the QUANTIZED embedding sample
(vec_id < 1024, the bounded training set) and writes them as integer
rows scaled by 128 to src/main/resources/graft/pca16x64.txt — the fixed
artifact Embeddings.pcaCoef serves, mirroring how a deployed rotation is
trained once and applied as constants. Deterministic: eigh on an exact
integer-derived covariance, sign fixed by the largest-|component| rule.

Usage: make_pca.py [SFDIR] [OUTFILE]
"""
import sys
import numpy as np
import duckdb

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (sys.argv[2] if len(sys.argv) > 2
           else "src/main/resources/graft/pca16x64.txt")
    con = duckdb.connect()
    rows = con.execute(
        "SELECT list_transform(embedding, x -> "
        "CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) "
        f"FROM read_parquet('{sf}/embeddings.parquet') "
        "WHERE vec_id < 1024 ORDER BY vec_id").fetchall()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    assert X.shape == (1024, 64), X.shape
    assert np.abs(X).max() < 2048, "quantized range exceeds the scale analysis"
    Xc = X - X.mean(axis=0)
    C = Xc.T @ Xc
    w, V = np.linalg.eigh(C)          # ascending eigenvalues
    V = V[:, ::-1][:, :16]            # top-16 axes, descending
    for k in range(16):               # deterministic sign convention
        j = int(np.argmax(np.abs(V[:, k])))
        if V[j, k] < 0:
            V[:, k] = -V[:, k]
    R = np.rint(V.T * 128).astype(int)  # 16 rows x 64, |coef| <= 128
    with open(out, "w") as f:
        f.write("\n".join(" ".join(str(v) for v in row) for row in R) + "\n")
    var = w[::-1][:16].sum() / w.sum()
    print(f"wrote {out}; top-16 axes capture {var:.3f} of sample variance")

if __name__ == "__main__":
    main()
