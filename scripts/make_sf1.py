#!/usr/bin/env python3
"""Synthesize a 10x blow-up of an sf dir ("sf1-ish") for the scaling
curve in BASELINE.md.

Usage: python3 scripts/make_sf1.py [src_sf_dir] [dst_dir] [copies]

Ten key-shifted copies of every fact table; dimension tables (region,
nation) stay single so every FK path still joins. Copies are DISTINCT
data, not duplicates: document texts get a per-copy prefix (so dedup
stays ~linear instead of re-running the 90%-dup stress probe) and
embeddings get a deterministic per-copy perturbation (so cosine
near-dup pair counts don't go quadratic in the copy count). events.ts
passes through as TIMESTAMP micros, matching the source corpus, so the
DuckDB oracle can compare TIMESTAMP literals at sf1.
"""
import sys, os
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SHIFT = 100_000_000

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

def union_copies(select_for):
    return "\nUNION ALL\n".join(select_for(i) for i in range(copies))

def write(name, sql):
    con.execute(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

# dimensions: single copy, keys unshifted
for t in ("region", "nation"):
    write(t, f"SELECT * FROM '{src}/{t}.parquet'")

write("customer", union_copies(lambda i:
    f"SELECT c_custkey + {i*SHIFT} AS c_custkey, * EXCLUDE (c_custkey) FROM '{src}/customer.parquet'"))
write("supplier", union_copies(lambda i:
    f"SELECT s_suppkey + {i*SHIFT} AS s_suppkey, * EXCLUDE (s_suppkey) FROM '{src}/supplier.parquet'"))
write("part", union_copies(lambda i:
    f"SELECT p_partkey + {i*SHIFT} AS p_partkey, * EXCLUDE (p_partkey) FROM '{src}/part.parquet'"))
write("orders", union_copies(lambda i:
    f"""SELECT o_orderkey + {i*SHIFT} AS o_orderkey, o_custkey + {i*SHIFT} AS o_custkey,
        * EXCLUDE (o_orderkey, o_custkey) FROM '{src}/orders.parquet'"""))
write("lineitem", union_copies(lambda i:
    f"""SELECT l_orderkey + {i*SHIFT} AS l_orderkey, l_partkey + {i*SHIFT} AS l_partkey,
        l_suppkey + {i*SHIFT} AS l_suppkey,
        * EXCLUDE (l_orderkey, l_partkey, l_suppkey) FROM '{src}/lineitem.parquet'"""))
# ts passes through as TIMESTAMP micros (the corpus's physical type
# since the r12 regen; Tables.events branches on whatever lands), so
# the DuckDB oracle's TIMESTAMP-literal comparisons work at sf1 too —
# the old epoch-nanos BIGINT form kept the events-family keys
# rows-only at this scale.
write("events", union_copies(lambda i:
    f"""SELECT event_id + {i*SHIFT} AS event_id, user_id + {i*SHIFT} AS user_id,
        * EXCLUDE (event_id, user_id) FROM '{src}/events.parquet'"""))
# every TOKEN gets the copy tag, so shingle sets are disjoint across
# copies: near-dup pairs stay within-copy and the corpus scales ~linearly
# (the cross-copy 90%-dup regime is the stress probe's job, not the
# scaling curve's)
TAG_TEXT = r"regexp_replace(text, '(\S+)', 'cI\1', 'g')"
# per-token n_chars adjustment = len of the actual tag ("c1" = 2, "c10" = 3)
NCHARS = r"n_chars + TAGLEN * len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))"
write("documents", union_copies(lambda i:
    f"""SELECT doc_id + {i*SHIFT} AS doc_id,
        {"text" if i == 0 else TAG_TEXT.replace("cI", f"c{i}")} AS text,
        {"n_chars" if i == 0 else NCHARS.replace("TAGLEN", str(len(f"c{i}")))} AS n_chars,
        * EXCLUDE (doc_id, text, n_chars) FROM '{src}/documents.parquet'"""))
# embeddings: deterministic per-(copy, vec, dim) perturbation keeps the
# copies decorrelated (fresh-looking vectors, not 10x near-duplicates)
write("embeddings", union_copies(lambda i:
    f"SELECT vec_id, embedding, label FROM '{src}/embeddings.parquet'" if i == 0 else
    f"""SELECT vec_id + {i*SHIFT} AS vec_id,
        list_transform(list_zip(embedding, range(1, len(embedding) + 1)),
          x -> CAST(x[1] + ((((vec_id * 64 + x[2]) * {i*37+101}) % 1997) - 998) / 998.0 * 0.3 AS FLOAT)) AS embedding,
        label FROM '{src}/embeddings.parquet'"""))
print("done:", dst)
