#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same testdata
parquet, and compare (column names, row counts, sorted-value hashes with
float tolerance). Usage: check.py <sfDir> <outDir>."""
import json, sys, math
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: no spark result ({e})"); fails += 1; continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    bad = None
    for c in cols:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            if not np.allclose(gv.astype(float), ev.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True):
                bad = c; break
        else:
            gs, es = gv.astype(str), ev.astype(str)
            if not (gs == es).all():
                bad = c; break
    if bad:
        m = (g[bad].astype(str) != e[bad].astype(str))
        print(f"FAIL {name}: column {bad} differs; first: got={g[bad][m].iloc[0]!r} exp={e[bad][m].iloc[0] if m.any() else '?'!r}")
        fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows")
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
