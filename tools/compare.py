#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py [sfdir] [outdir] [query ...]

Optional trailing query names restrict the comparison (the VerifyOne
fast loop without rebuilding oracle_sql.json).

Reads each query's parquet dump under outdir, runs the corresponding oracle
SQL from oracle_sql.json in DuckDB (with views named after the fixture
tables), sorts columns by name, and compares values exactly. Reports
per-query: schema match, row count match, value match (both in emitted order
and row-sorted).
"""
import json
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
only = set(sys.argv[3:])
if only:
    missing = only - set(oracle)
    if missing:
        print(f"unknown queries: {sorted(missing)}")
        sys.exit(2)
    oracle = {k: v for k, v in oracle.items() if k in only}

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        mine = norm(pd.read_parquet(f"{OUT}/{name}"))
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})")
        fails += 1
        continue
    try:
        ref = norm(con.execute(sql).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    status = []
    if list(mine.columns) != list(ref.columns):
        status.append(f"schema: mine={list(mine.columns)} ref={list(ref.columns)}")
    if len(mine) != len(ref):
        status.append(f"rows: mine={len(mine)} ref={len(ref)}")
    if not status:
        m, r = mine.astype(str), ref.astype(str)
        if not m.equals(r):
            ms = m.sort_values(by=list(m.columns)).reset_index(drop=True)
            rs = r.sort_values(by=list(r.columns)).reset_index(drop=True)
            if ms.equals(rs):
                status.append("values match only after row sort (ORDER BY mismatch)")
            else:
                diff = (ms != rs).any(axis=1)
                idx = diff[diff].index[:3]
                status.append("VALUES DIFFER, e.g.:")
                for i in idx:
                    status.append(f"  mine={ms.loc[i].to_dict()}")
                    status.append(f"   ref={rs.loc[i].to_dict()}")
    if status:
        fails += 1
        print(f"FAIL {name}: " + "; ".join(status[:1]))
        for s in status[1:]:
            print("   " + s)
    else:
        print(f"OK   {name} ({len(mine)} rows)")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
