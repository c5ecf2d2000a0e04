#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify, then execute
each oracle SQL in DuckDB against the same parquet tables and compare
schema (names + arrow types) and row-sets. Floats compare at full repr
precision by default (our parity protocol aims for bit-exactness after
round-6 on both engines); pass --tol9 to fall back to 9 significant
digits. Usage: tools/check_oracle.py <sfDir> <outDir> [--tol9]."""
import json, math, sys
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
tol9 = "--tol9" in sys.argv
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}" if tol9 else repr(v)
    return str(v)

def fetch(src_sql):
    rel = con.sql(src_sql)
    cols = sorted(rel.columns)
    q = ", ".join(f'"{c}"' for c in cols)
    proj = con.sql(f"SELECT {q} FROM ({src_sql})")
    arrow = proj.limit(0).arrow()
    types = {f.name: str(f.type) for f in arrow.schema}
    rows = sorted(tuple(norm(v) for v in row)
                  for row in con.sql(f"SELECT {q} FROM ({src_sql})").fetchall())
    return cols, types, rows

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        want_cols, want_types, want_rows = fetch(sql)
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    try:
        got_cols, got_types, got_rows = fetch(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    except Exception as e:
        print(f"FAIL {name}: spark output error: {e}")
        fails += 1
        continue
    if want_cols != got_cols:
        print(f"FAIL {name}: columns want={want_cols} got={got_cols}")
        fails += 1
        continue
    tmism = {c: (want_types[c], got_types[c]) for c in want_cols if want_types[c] != got_types[c]}
    if tmism:
        print(f"FAIL {name}: dtype mismatch {tmism}")
        fails += 1
        continue
    if want_rows != got_rows:
        setg = set(got_rows)
        setw = set(want_rows)
        diff_w = [r for r in want_rows if r not in setg][:3]
        diff_g = [r for r in got_rows if r not in setw][:3]
        print(f"FAIL {name}: rows want={len(want_rows)} got={len(got_rows)}")
        print(f"  only-in-oracle: {diff_w}")
        print(f"  only-in-spark:  {diff_g}")
        fails += 1
    else:
        print(f"OK   {name}: {len(got_rows)} rows")
sys.exit(1 if fails else 0)
