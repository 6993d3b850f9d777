#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB at a given scale factor — the
single-node baseline BENCH numbers are graded against.

Usage: python3 scripts/baseline_duckdb.py <sf_dir> <oracle_sql.json> [reps]
Prints one JSON line: {"query": best_of_reps_seconds, ...}
"""
import sys, json, glob, os, time
import duckdb

sf_dir, oracle_path = sys.argv[1], sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(oracle_path))
out = {}
for name in sorted(oracle):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        con.execute(oracle[name]).fetchall()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)
print(json.dumps({"unit": "sec", "sf": sf_dir, "reps": reps, "queries": out}))
