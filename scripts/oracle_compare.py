#!/usr/bin/env python3
# Replicates the grading driver: run each SparkEntry.oracleSql in DuckDB
# against the sf tables and diff (schema, rowcount, sorted values) vs the
# parquet written by `sbt "runMain graft.Verify <sfDir> <outDir>"`.
#
# IMPORTANT: the Spark side is read with pandas/pyarrow (NOT duckdb) because
# that is what the driver does — duckdb's read_parquet silently normalizes
# DECIMAL->float64, hiding exactly the repr mismatches the driver flags
# (round-1 bug: Decimal('253942.00') vs 253942.0). Values are compared by
# str() repr, like the driver's hash of stringified cells.
# Usage: python3 scripts/oracle_compare.py [sfDir] [voutDir]
import duckdb, json, glob, sys, math
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
vout = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify/vout"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"create view {t} as select * from read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f"{vout}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    try:
        parts = sorted(glob.glob(f"{vout}/{name}/*.parquet"))
        sdf = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
    except Exception as e:
        print(f"{name}: SPARK OUTPUT MISSING/UNREADABLE: {e}"); fails += 1; continue
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"{name}: SCHEMA MISMATCH oracle={ocols} spark={scols}"); fails += 1; continue
    if len(odf) != len(sdf):
        print(f"{name}: ROWCOUNT {len(odf)} vs {len(sdf)}"); fails += 1; continue
    try:  # driver sorts by all columns — crashes on array cells (by design)
        o = odf[ocols].sort_values(ocols).reset_index(drop=True)
        s = sdf[scols].sort_values(scols).reset_index(drop=True)
    except Exception as e:
        print(f"{name}: SORT CRASH (driver would err too): {e}"); fails += 1; continue
    ok = True
    for c in ocols:
        ov, sv = o[c].tolist(), s[c].tolist()
        for i, (a, b) in enumerate(zip(ov, sv)):
            nan_eq = (isinstance(a, float) and isinstance(b, float)
                      and math.isnan(a) and math.isnan(b))
            if not nan_eq and str(a) != str(b):
                print(f"{name}: REPR DIFF col={c} row={i}: oracle={a!r} spark={b!r}")
                ok = False; break
        if not ok: break
    if ok: print(f"{name}: OK rows={len(odf)}")
    else: fails += 1

# rows-only queries (no oracle): the driver still pandas-sorts them for the
# row hash — verify every output is sortable (array cells crash it)
import os
for d in sorted(glob.glob(f"{vout}/*")):
    name = os.path.basename(d)
    if not os.path.isdir(d) or name in oracle:
        continue
    try:
        parts = sorted(glob.glob(f"{d}/*.parquet"))
        sdf = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns))
        print(f"{name}: rows-only OK rows={len(sdf)}")
    except Exception as e:
        print(f"{name}: ROWS-ONLY SORT CRASH (driver would err): {e}"); fails += 1
print("FAILS:", fails)
