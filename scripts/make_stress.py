#!/usr/bin/env python3
"""Dup-heavy stress dataset (shift 1e9 so ids stay distinct even when
src is a make_sf1.py output, whose own copies are shifted by 1e8) for BASELINE.md's probe: sf tables with
documents replaced by `copies` key-shifted copies with IDENTICAL texts
(90% duplication at copies=10 — the bad-web-crawl regime).

Usage: python3 scripts/make_stress.py [src_sf_dir] [dst_dir] [copies]
Then:  SPARK_GRAFT_SF_DIR=<dst> sbt "runMain graft.Bench q13_dedup_exact q14_minhash_lsh q14c_ngram_jaccard q28_corpus_prep"
"""
import sys, os, shutil, glob
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_stress"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)
for t in glob.glob(f"{src}/*.parquet"):
    name = os.path.basename(t)
    if name != "documents.parquet":
        shutil.copy(t, f"{dst}/{name}")
con = duckdb.connect()
sql = "\nUNION ALL\n".join(
    f"SELECT doc_id + {i*1_000_000_000} AS doc_id, * EXCLUDE (doc_id) FROM '{src}/documents.parquet'"
    for i in range(copies))
con.execute(f"COPY ({sql}) TO '{dst}/documents.parquet' (FORMAT PARQUET)")
print("documents:", con.execute(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0])
