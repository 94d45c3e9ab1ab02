#!/usr/bin/env python3
"""Compare Verify.scala's parquet dumps against the DuckDB oracle SQL —
a local replica of the driver's correctness gate (rows + schema + value
hash). Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

with open(os.path.join(out, "oracle_sql.json")) as f:
    oracle = json.load(f)

con = duckdb.connect()
for t in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{t}/*.parquet')"
                if os.path.isdir(t) else
                f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{t}')")

fail = 0
for q, sql in sorted(oracle.items()):
    if only and q not in only:
        continue
    d = os.path.join(out, q)
    if not os.path.isdir(d):
        print(f"{q}: MISSING spark dump")
        fail += 1
        continue
    spark_rows = con.execute(
        f"SELECT * FROM parquet_scan('{d}/*.parquet')").fetchall()
    try:
        oracle_rows = con.execute(sql).fetchall()
    except Exception as e:
        print(f"{q}: ORACLE ERROR {e}")
        fail += 1
        continue
    if len(spark_rows) != len(oracle_rows):
        print(f"{q}: ROWS {len(spark_rows)} vs {len(oracle_rows)}")
        fail += 1
        continue
    def norm(rows):
        return [tuple(str(v) for v in r) for r in rows]
    if norm(spark_rows) != norm(oracle_rows):
        sn, on = norm(spark_rows), norm(oracle_rows)
        bad = next(i for i in range(len(sn)) if sn[i] != on[i])
        print(f"{q}: VALUE MISMATCH at row {bad}: {sn[bad]} vs {on[bad]}")
        fail += 1
        continue
    print(f"{q}: OK ({len(spark_rows)} rows)")
sys.exit(1 if fail else 0)
