#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same testdata
parquet, and compare EXACTLY (column names, row counts, sorted-value string
hashes — no float tolerance, matching the driver's exact-hash compare; a
DuckDB HUGEINT that lands as float64 will fail here just as it fails
driver-side). Usage: check.py <sfDir> <outDir>."""
import json, sys, math
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    # driver fixtures ship <table>.parquet as a single FILE; ScaleUp
    # rehearsal corpora write it as a DIRECTORY of part files — glob those
    path = f"{sfdir}/{t}.parquet"
    import os
    pat = path if os.path.isfile(path) else f"{path}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")

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
        # Exact compare, like the driver: stringify and demand equality.
        # Dtype mismatches (e.g. int64 vs float64 from an uncast DuckDB
        # HUGEINT sum) surface as "42" vs "42.0" string diffs — by design.
        if gv.dtype.kind != ev.dtype.kind:
            print(f"WARN {name}: column {c} dtype {gv.dtype} (spark) vs {ev.dtype} (oracle)")
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
