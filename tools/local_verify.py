#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare (rows, schema-ish, values)
against the parquet Verify wrote. Usage: local_verify.py <sfdir> <outdir>"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    d = f"{outdir}/{name}"
    if not os.path.isdir(d):
        fails.append((name, "no spark output")); continue
    files = glob.glob(f"{d}/*.parquet")
    got = con.execute(f"SELECT * FROM read_parquet({files})").fetchdf()
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}")); continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        # list/ndarray cells are unhashable for sorting — canonicalize
        for c in df.columns:
            if df[c].map(lambda v: hasattr(v, "__len__") and not isinstance(v, str)).any():
                df[c] = df[c].map(lambda v: tuple(v) if hasattr(v, "__len__") and not isinstance(v, str) else v)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        fails.append((name, f"cols {list(g.columns)} vs {list(e.columns)}")); continue
    if len(g) != len(e):
        fails.append((name, f"rows {len(g)} vs {len(e)}")); continue
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        print(f"OK    {name} ({len(g)} rows)")
    except AssertionError as ex:
        msg = str(ex).split("\n")[0:4]
        fails.append((name, " | ".join(msg)))
for n, m in fails:
    print(f"FAIL  {n}: {m}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
