#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with the sf tables
registered as views, sorts columns by name, and compares values exactly
(with a secondary tolerance report for doubles).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d)))
fail = 0
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"[MISS ] {name}: no spark output"); fail += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    if name not in oracle:
        print(f"[ROWS ] {name}: rows={len(got)} (no oracle)")
        if len(got) == 0: fail += 1
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"[OERR ] {name}: oracle failed: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    exp = exp.reindex(sorted(exp.columns), axis=1).reset_index(drop=True)
    if list(got.columns) != list(exp.columns):
        print(f"[COLS ] {name}: spark={list(got.columns)} duck={list(exp.columns)}")
        fail += 1; continue
    if len(got) != len(exp):
        print(f"[NROW ] {name}: spark={len(got)} duck={len(exp)}"); fail += 1; continue
    bad = []
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype != e.dtype:
            bad.append(f"{c}: dtype {g.dtype} vs {e.dtype}")
            continue
        if np.issubdtype(g.dtype, np.floating):
            eq = (g.values == e.values) | (g.isna().values & e.isna().values)
            if not eq.all():
                close = np.isclose(g.fillna(0), e.fillna(0), rtol=1e-9, atol=1e-9).all()
                bad.append(f"{c}: {int((~eq).sum())} exact diffs"
                           + (" (within 1e-9)" if close else " (LARGE)"))
        else:
            eq = (g.astype(object).values == e.astype(object).values) | \
                 (g.isna().values & e.isna().values)
            if not eq.all():
                i = int(np.argmax(~eq))
                bad.append(f"{c}: {int((~eq).sum())} diffs, first@{i}: {g.iloc[i]!r} vs {e.iloc[i]!r}")
    if bad:
        print(f"[FAIL ] {name}: " + "; ".join(bad)); fail += 1
    else:
        print(f"[OK   ] {name}: {len(got)} rows")
missing = set(oracle) - set(names)
if missing:
    print(f"[WARN ] oracle without output: {sorted(missing)}")
sys.exit(1 if fail else 0)
