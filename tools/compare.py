#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: read each
graft.Verify parquet output, run the matching oracle SQL in DuckDB over the
same testdata tables, and compare (rows, schema-ish, sorted values).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    try:
        spark_df = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetchdf()
    except Exception as e:
        results[name] = f"SPARK-READ-FAIL {e}"
        continue
    if name not in oracle:
        results[name] = f"rows-only ({len(spark_df)} rows)"
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE-FAIL {type(e).__name__} {e}"
        continue
    # driver contract: sort columns by name, then compare values
    a = spark_df[sorted(spark_df.columns)]
    b = duck_df[sorted(duck_df.columns)]
    if list(a.columns) != list(b.columns):
        results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        continue
    if len(a) != len(b):
        results[name] = f"ROWCOUNT-MISMATCH spark={len(a)} duck={len(b)}"
        continue
    a = a.astype(str).sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.astype(str).sort_values(by=list(b.columns)).reset_index(drop=True)
    if a.equals(b):
        results[name] = f"OK ({len(a)} rows)"
    else:
        diff = (a != b).any(axis=1)
        idx = diff[diff].index[:3]
        detail = []
        for i in idx:
            detail.append(f"row{i}: spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}")
        results[name] = "VALUE-MISMATCH " + " | ".join(detail)

ok = sum(1 for v in results.values() if v.startswith("OK"))
for k, v in results.items():
    print(f"{k:28s} {v[:400]}")
print(f"\n{ok}/{len(results)} OK")
