#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <outDir>
  1. expects Verify to have written <outDir>/<name>/ parquet + oracle_sql.json
  2. runs each oracle SQL in DuckDB against the sfDir tables
  3. compares values (columns sorted by name, rows as-written)
"""
import json, sys, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fail += 1
        continue
    got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fail += 1
        continue
    # value compare, exact
    mismatch = None
    for c in exp.columns:
        ev, gv = exp[c], got[c]
        try:
            eq = (ev.astype(str) == gv.astype(str)).all()
        except Exception:
            eq = False
        if not eq:
            bad = (ev.astype(str) != gv.astype(str))
            i = bad[bad].index[0]
            mismatch = (c, i, ev[i], gv[i])
            break
    if mismatch:
        c, i, e, g = mismatch
        print(f"FAIL {name}: col {c} row {i}: oracle={e!r} spark={g!r}")
        fail += 1
    else:
        print(f"PASS {name} ({len(exp)} rows)")
print(f"\n{len(oracle) - fail}/{len(oracle)} passed")
sys.exit(1 if fail else 0)
