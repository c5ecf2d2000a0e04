#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify, then execute
each oracle SQL in DuckDB against the same parquet tables and compare
row-sets (columns sorted by name, rows sorted, values hashed after
normalizing floats). Usage: tools/check_oracle.py <sfDir> <outDir>."""
import json, math, sys
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql)
        want_cols = sorted(want.columns)
        want_rows = sorted(tuple(norm(v) for v in row) for row in
                           con.sql(f"SELECT {', '.join(want_cols)} FROM ({sql})").fetchall())
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = sorted(got.columns)
        got_rows = sorted(tuple(norm(v) for v in row) for row in
                          con.sql(f"SELECT {', '.join(got_cols)} FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall())
    except Exception as e:
        print(f"FAIL {name}: spark output error: {e}")
        fails += 1
        continue
    if want_cols != got_cols:
        print(f"FAIL {name}: columns want={want_cols} got={got_cols}")
        fails += 1
    elif want_rows != got_rows:
        diff_w = [r for r in want_rows if r not in set(got_rows)][:5]
        diff_g = [r for r in got_rows if r not in set(want_rows)][:5]
        print(f"FAIL {name}: rows want={len(want_rows)} got={len(got_rows)}")
        print(f"  only-in-oracle: {diff_w}")
        print(f"  only-in-spark:  {diff_g}")
        fails += 1
    else:
        print(f"OK   {name}: {len(got_rows)} rows")
missing = set(json.load(open(f"{out_dir}/oracle_sql.json"))) - set(oracle)
sys.exit(1 if fails else 0)
