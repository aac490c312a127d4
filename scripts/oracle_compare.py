#!/usr/bin/env python3
# Replicates the grading driver: run each SparkEntry.oracleSql in DuckDB
# against the sf tables and diff (schema, rowcount, sorted values) vs the
# parquet written by `sbt "runMain graft.Verify <sfDir> <outDir>"`.
# Usage: python3 scripts/oracle_compare.py [sfDir] [voutDir]
import duckdb, json, glob, sys, math
import sys
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
        sdf = con.sql(f"select * from read_parquet('{vout}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"{name}: SPARK OUTPUT MISSING: {e}"); fails += 1; continue
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"{name}: SCHEMA MISMATCH oracle={ocols} spark={scols}"); fails += 1; continue
    if len(odf) != len(sdf):
        print(f"{name}: ROWCOUNT {len(odf)} vs {len(sdf)}"); fails += 1; continue
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    ok = True
    for c in ocols:
        ov, sv = o[c].tolist(), s[c].tolist()
        for i,(a,b) in enumerate(zip(ov,sv)):
            eq = (a == b) or (isinstance(a,float) and isinstance(b,float) and (math.isclose(a,b,rel_tol=0,abs_tol=0) or (math.isnan(a) and math.isnan(b))))
            if not eq and str(a) != str(b):
                print(f"{name}: VALUE DIFF col={c} row={i}: oracle={a!r} spark={b!r}")
                ok = False; break
        if not ok: break
    if ok: print(f"{name}: OK rows={len(odf)}")
    else: fails += 1
print("FAILS:", fails)
