#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query
parquet under OUTDIR, run the matching oracle_sql.json entry in DuckDB
against the sf parquet tables, sort columns by name, and compare values
row by row. Usage: check_oracle.py <sfDir> <outDir>"""
import json, sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        print(f"{name}: NO-ORACLE rows={len(got)} " +
              ("OK(rows>0)" if len(got) > 0 else "FAIL(empty)"))
        if len(got) == 0: fails += 1
        continue
    exp = con.execute(oracle[name]).fetchdf()
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"{name}: FAIL cols spark={list(got.columns)} duck={list(exp.columns)}")
        fails += 1; continue
    if got.dtypes.to_dict() != exp.dtypes.to_dict():
        print(f"{name}: WARN dtypes spark={got.dtypes.to_dict()} duck={exp.dtypes.to_dict()}")
    if len(got) != len(exp):
        print(f"{name}: FAIL rows spark={len(got)} duck={len(exp)}")
        fails += 1; continue
    import numpy as np
    import pandas as pd
    neq = np.zeros(got.shape, dtype=bool)
    for ci, c in enumerate(got.columns):
        a, b = got[c], exp[c]
        both_na = a.isna() & b.isna()
        eq = (a == b) | both_na
        neq[:, ci] = ~eq.values
    if neq.any():
        idx = list(zip(*np.where(neq)))[:5]
        print(f"{name}: FAIL {neq.sum()} cell diffs; first at {idx}")
        for r, c in idx[:3]:
            print(f"   row {r} col {got.columns[c]}: spark={got.iat[r,c]!r} duck={exp.iat[r,c]!r}")
        fails += 1; continue
    print(f"{name}: OK rows={len(got)}")
sys.exit(1 if fails else 0)
