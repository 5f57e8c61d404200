#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output) and runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables; compares after sorting columns by name and rows by value.
Dev tooling only — the shipped library is pure Scala/Spark.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # stable stringified sort for mixed types
    key = pd.Series(df.astype(str).agg('|'.join, axis=1))
    df = df.loc[key.sort_values(kind='mergesort').index].reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            want = con.execute(sql).df()
        except Exception as e:
            print(f"ERROR    {name}: {e}"); n_bad += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"SCHEMA   {name}: spark={list(g.columns)} duckdb={list(w.columns)}")
            n_bad += 1; continue
        if len(g) != len(w):
            print(f"ROWS     {name}: spark={len(g)} duckdb={len(w)}"); n_bad += 1; continue
        mismatch = None
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                af = a.astype(float).to_numpy(); bf = b.astype(float).to_numpy()
                eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
                exact = eq.all()
                close = np.allclose(af, bf, rtol=1e-12, equal_nan=True)
                if not exact:
                    mismatch = (c, 'float-exact' if close else 'float-DIFF',
                                af[~eq][:3], bf[~eq][:3])
                    if not close: break
            else:
                eq = (a.astype(str).to_numpy() == b.astype(str).to_numpy())
                if not eq.all():
                    mismatch = (c, 'value', a[~eq][:3].tolist(), b[~eq][:3].tolist()); break
        if mismatch and mismatch[1] != 'float-exact':
            print(f"VALUE    {name}: col={mismatch[0]} kind={mismatch[1]} spark={mismatch[2]} duckdb={mismatch[3]}")
            n_bad += 1
        elif mismatch:
            print(f"WARN~    {name}: col={mismatch[0]} bit-inexact but rtol-close: {mismatch[2]} vs {mismatch[3]}")
            n_ok += 1
        else:
            print(f"OK       {name} ({len(g)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
