#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_correctness.py <sf_dir> <verify_out_dir>

Reads each <verify_out_dir>/<name> parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with views
registered for every testdata table, and compares: row count, column
names, and a hash of the value matrix with columns sorted by name and
rows sorted by all columns (mirrors the driver's described compare).
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def array_cols(df: pd.DataFrame):
    """Columns holding list/ndarray cells. The driver's pandas compare
    (sort_values -> lexsort_indexer -> factorize) throws
    `unhashable type: numpy.ndarray` on these, so this local stand-in
    must FAIL them too — the r7 tuple-conversion leniency let
    q49_sq_encode pass locally while the driver's gate went red.
    Oracle keys must emit scalar, sortable columns only."""
    import numpy as np
    bad = []
    for c in df.columns:
        if df[c].dtype == object and len(df):
            non_null = df[c].dropna()
            # scan EVERY non-null cell: a mixed column whose first
            # non-null value is scalar but holds lists later would
            # otherwise bypass this gate and blow up in sort_values
            if len(non_null) and non_null.map(
                    lambda v: isinstance(v, (list, np.ndarray))).any():
                bad.append(c)
    return bad

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def norm_cell(v):
    import numpy as np
    if isinstance(v, (float,)) or (hasattr(v, "dtype") and "float" in str(getattr(v, "dtype", ""))):
        # + 0.0 canonicalizes -0.0 (DuckDB round can emit -0.0 where
        # Spark's BigDecimal round emits +0.0 — same value, different text)
        return f"{float(v) + 0.0:.6f}"
    if hasattr(v, "item"):
        v = v.item()
    return str(v)

def mat_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(norm_cell(v) for v in row) + "\n").encode())
    return h.hexdigest()[:16]

fails = []
# A query that THREW in Verify leaves no result dir — that must fail the
# gate, not silently drop out of the loop. Rows-only queries are not in
# oracle_sql.json, so check them from the explicit list.
ROWS_ONLY = {"q02_metadata", "q05b_bpe", "q10_index_roundtrip", "q18_multimodal",
             "q61b_opq_search"}
for name in sorted(set(oracle) | ROWS_ONLY):
    if not os.path.isdir(os.path.join(out_dir, name)):
        print(f"{name:24s} NO RESULT DIR (query failed in Verify)")
        fails.append(name)
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{path}/*.parquet")],
                         ignore_index=True)
    if name not in oracle:
        print(f"{name:24s} rows-only: {len(spark_df)} rows "
              f"{'OK' if len(spark_df) > 0 else 'EMPTY!'}")
        if len(spark_df) == 0:
            fails.append(name)
        continue
    try:
        oracle_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        fails.append(name)
        continue
    bad = array_cols(spark_df) + array_cols(oracle_df)
    if bad:
        print(f"{name:24s} ARRAY COLUMN {sorted(set(bad))} — driver-unsortable, FAIL")
        fails.append(name)
        continue
    # A comparison crash (e.g. an unsortable cell type the array gate
    # didn't classify) must fail THIS query, not abort the whole gate run.
    try:
        s, o = canon(spark_df), canon(oracle_df)
    except Exception as e:
        print(f"{name:24s} COMPARE ERROR: {e}")
        fails.append(name)
        continue
    cols_ok = list(s.columns) == list(o.columns)
    rows_ok = len(s) == len(o)
    hash_ok = cols_ok and rows_ok and mat_hash(s) == mat_hash(o)
    status = "OK" if hash_ok else "MISMATCH"
    print(f"{name:24s} rows={len(s)}/{len(o)} cols_ok={cols_ok} hash_ok={hash_ok} {status}")
    if not hash_ok:
        fails.append(name)
        if cols_ok and rows_ok:
            diff = (s.astype(str) != o.astype(str))
            bad = diff.any(axis=1)
            print("  spark:", s[bad].head(3).to_dict("records"))
            print("  oracle:", o[bad].head(3).to_dict("records"))
        else:
            print("  spark cols:", list(s.columns), len(s))
            print("  oracle cols:", list(o.columns), len(o))

print("FAILED:" if fails else "ALL GREEN", fails)
sys.exit(1 if fails else 0)
