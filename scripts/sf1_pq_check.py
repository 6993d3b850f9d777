#!/usr/bin/env python3
"""sf1 PQ/IVF-family exact checker — the bounded counterpart of
check_correctness.py for the keys whose naive DuckDB mirrors time out
at sf1 (q48/q57/q61/q62/q81/q82 + the flat q45b leg).

Usage: python3 scripts/sf1_pq_check.py <sf_dir> <verify_out_dir>

<verify_out_dir> must hold a graft.Verify dump AT <sf_dir> scale (the
bounded SQL reads Spark's own q09 assignment and the claimed top-k sets
— see the contract note on OracleSql.sf1Bounded). Checks, in order:

1. assign_spotcheck — re-derives the IVF argmin EXACTLY for a 1/97
   vector sample and fails on any row where Spark's q09 assignment
   disagrees (this is what licenses substituting spark_assigned for the
   derived assignment everywhere else).
2. q48/q57/q81 — complete exact verdicts (probed-cell members are the
   whole candidate set of the top-k).
3. q82 — exact for the 5 smallest cells (Spark rows filtered to match).
4. q62 — exact for the ivf/ivfpq legs (Spark rows filtered to match;
   the flat pq_adc leg is covered by the q45b check).
5. q45b/q61 — sampled-universe refutation: the bounded top-k over
   (every 10th vector ∪ stride rows ∪ Spark's claimed rows) must equal
   Spark's top-k exactly.
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

def spark_df(key):
    return pd.concat([pd.read_parquet(f)
                      for f in glob.glob(f"{out_dir}/{key}/*.parquet")],
                     ignore_index=True)

# views over Spark's own outputs (the sf1Bounded contract)
con.execute(f"CREATE VIEW spark_assigned AS SELECT vec_id, centroid_id "
            f"FROM read_parquet('{out_dir}/q09_ivf_build/*.parquet')")
con.execute(f"CREATE VIEW spark_q45b AS SELECT vec_id "
            f"FROM read_parquet('{out_dir}/q45b_pq_search/*.parquet')")
con.execute(f"CREATE VIEW spark_q61 AS SELECT vec_id "
            f"FROM read_parquet('{out_dir}/q61_rpq_search/*.parquet')")

bounded = json.load(open(f"{out_dir}/oracle_sql_sf1bounded.json"))

def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def norm_cell(v):
    if isinstance(v, float) or (hasattr(v, "dtype") and "float" in str(getattr(v, "dtype", ""))):
        return f"{float(v) + 0.0:.6f}"
    if hasattr(v, "item"):
        v = v.item()
    return str(v)

def mat_hash(df):
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(norm_cell(v) for v in row) + "\n").encode())
    return h.hexdigest()[:16]

fails = []

def compare(key, oracle_df, spark):
    s, o = canon(spark), canon(oracle_df)
    cols_ok = list(s.columns) == list(o.columns)
    rows_ok = len(s) == len(o)
    ok = cols_ok and rows_ok and mat_hash(s) == mat_hash(o)
    print(f"{key:24s} rows={len(s)}/{len(o)} cols_ok={cols_ok} "
          f"hash_ok={ok} {'OK' if ok else 'MISMATCH'}")
    if not ok:
        fails.append(key)
        if cols_ok and rows_ok:
            diff = (s.astype(str) != o.astype(str)).any(axis=1)
            print("  spark:", s[diff].head(3).to_dict("records"))
            print("  oracle:", o[diff].head(3).to_dict("records"))
        else:
            print("  spark cols:", list(s.columns), len(s))
            print("  oracle cols:", list(o.columns), len(o))

# 1. the assignment spot-check gates everything else
mism = con.execute(bounded["assign_spotcheck"]).fetchdf()
print(f"{'assign_spotcheck':24s} mismatches={len(mism)} "
      f"{'OK' if len(mism) == 0 else 'FAIL'}")
if len(mism):
    print(mism.head(5).to_dict("records"))
    fails.append("assign_spotcheck")

# 2-5. bounded exact compares
for key in ["q48_ivfpq_search", "q57_ivfpq_residual", "q81_serve_composed",
            "q45b_pq_search", "q61_rpq_search", "q82_pq_error",
            "q62_ann_recall"]:
    try:
        oracle_df = con.execute(bounded[key]).fetchdf()
    except Exception as e:
        print(f"{key:24s} ORACLE SQL ERROR: {e}")
        fails.append(key)
        continue
    spark = spark_df(key)
    if key == "q82_pq_error":
        cells = set(oracle_df["centroid_id"])
        spark = spark[spark["centroid_id"].isin(cells)]
    if key == "q62_ann_recall":
        spark = spark[spark["method"].isin(["ivf", "ivfpq"])]
    compare(key, oracle_df, spark)

print("FAILED:" if fails else "ALL GREEN (sf1-bounded PQ family)", fails)
sys.exit(1 if fails else 0)
