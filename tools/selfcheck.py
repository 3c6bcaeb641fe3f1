#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify's parquet
dumps against DuckDB running oracle_sql.json on the same sf tables.
Usage: tools/selfcheck.py [sfdir] [verify_out]
"""
import json
import sys

import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    # sort columns by name, stringify, sort rows -> order-insensitive digest
    df = df[sorted(df.columns)]
    rows = sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))
    return df.dtypes.to_dict(), rows

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        mine = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        ref = con.execute(sql).df()
        mt, mr = canon(mine)
        rt, rr = canon(ref)
        if mr == rr:
            passes.append(name)
            if [str(x) for x in mt.values()] != [str(x) for x in rt.values()]:
                print(f"  ~ {name}: values match, dtypes differ: {mt} vs {rt}")
        else:
            fails.append(name)
            print(f"FAIL {name}: rows {len(mr)} vs {len(rr)}")
            diff_a = [r for r in mr if r not in set(map(tuple, rr))][:3]
            diff_b = [r for r in rr if r not in set(map(tuple, mr))][:3]
            print(f"  mine-only: {diff_a}")
            print(f"  ref-only : {diff_b}")
    except Exception as e:
        fails.append(name)
        print(f"ERROR {name}: {e}")

print(f"\n{len(passes)}/{len(oracle)} oracle queries match; fails: {fails}")
sys.exit(1 if fails else 0)
