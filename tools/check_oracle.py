#!/usr/bin/env python3
"""Dev-loop mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py [sf_dir] [verify_out_dir]
Reads <out>/oracle_sql.json, runs each SQL in DuckDB over the sf_dir
parquet tables, and diffs against the parquet the Spark Verify main wrote.
"""
import duckdb, json, sys, math
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
ok, fails = [], []
for name, sql in sorted(oracle.items()):
    try:
        mine = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
        orc = con.sql(sql).df()
        mine = mine.reindex(sorted(mine.columns), axis=1)
        orc = orc.reindex(sorted(orc.columns), axis=1)
        if list(mine.columns) != list(orc.columns):
            fails.append((name, f"cols {list(mine.columns)} vs {list(orc.columns)}"))
            continue
        if len(mine) != len(orc):
            fails.append((name, f"rows {len(mine)} vs {len(orc)}"))
            continue
        cols = list(mine.columns)
        mine = mine.sort_values(by=cols).reset_index(drop=True)
        orc = orc.sort_values(by=cols).reset_index(drop=True)
        bad = None
        for c in cols:
            a, b = mine[c], orc[c]
            if str(a.dtype) != str(b.dtype):
                bad = f"dtype[{c}] {a.dtype} vs {b.dtype}"
                break
            if a.dtype.kind == "f":
                eqs = (a.isna() & b.isna()) | (abs(a - b) < 1e-9)
            else:
                eqs = (a.isna() & b.isna()) | (a == b)
            if not eqs.all():
                i = (~eqs).idxmax()
                bad = f"val[{c}] row{i}: {a[i]!r} vs {b[i]!r}"
                break
        if bad:
            fails.append((name, bad))
        else:
            ok.append(name)
    except Exception as e:
        fails.append((name, f"EXC {type(e).__name__}: {str(e)[:200]}"))

for n in ok:
    print(f"  OK   {n}")
for n, why in fails:
    print(f"  FAIL {n}: {why}")
print(f"\n{len(ok)}/{len(oracle)} matched")
sys.exit(1 if fails else 0)
