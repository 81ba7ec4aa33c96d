#!/usr/bin/env python3
#  Copyright (c) 2026 graft contributors
#  SPDX-License-Identifier: Apache-2.0
"""Synthesize a ~10x (sf1-equivalent) dataset from sf0.1 for SCALE
validation runs (dev tool only — correctness gates stay on the
driver-generated sf dirs; this data exists to measure sf0.1->sf1
wall-time ratios of the heavy queries, never to define answers).

Scaling model: 10 key-shifted copies of each table, chosen so each
query's workload CHARACTER is preserved rather than degenerated:

- lineitem/orders/customer/supplier: keys shifted per copy with
  CONSISTENT offsets across tables (joins still land), so the
  co-purchase graph becomes 10 disjoint copies -> |V|, |E| x10 with
  the same degree distribution (the honest scale-up for q154/q146).
- documents: doc_id shifted; ~1 in 6 words deterministically rewritten
  per copy so cross-copy Jaccard falls below dedup thresholds --
  near-dup families stay within-copy and output scales ~linearly
  (verbatim copies would explode pair counts quadratically, testing
  nothing real).
- embeddings: vec_id shifted; each copy's vectors cyclically rotated
  by a copy-specific offset (norm-preserving, similarity-destroying)
  so ANN/near-dup neighborhoods stay copy-local.
- events: event_id/user_id shifted; timestamps unchanged (same day
  range, 10x rows/day -- the steady-state ingest shape).

Usage: python3 scripts/make_sf1.py [/tmp/graft_sf1]
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def scale_sql(table, shifts):
    """Union COPIES key-shifted copies of a table. shifts maps column
    -> per-copy offset expression factor (column + i*offset)."""
    desc = con.sql(
        f"describe select * from '{SRC}/{table}.parquet'").fetchall()
    parts = []
    for i in range(COPIES):
        cols = []
        for (name, *_rest) in desc:
            if name in shifts:
                cols.append(f"{name} + {i} * {shifts[name]} AS {name}")
            else:
                cols.append(name)
        parts.append(
            f"select {', '.join(cols)} from '{SRC}/{table}.parquet'")
    sql = " union all ".join(parts)
    con.sql(f"copy ({sql}) to '{OUT}/{table}.parquet' (format parquet)")
    n = con.sql(f"select count(*) from '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


# key domains (shift offsets = comfortably past the max key)
scale_sql("lineitem", {"l_orderkey": 1_000_000, "l_partkey": 100_000,
                       "l_suppkey": 100_000})
scale_sql("orders", {"o_orderkey": 1_000_000, "o_custkey": 100_000})
scale_sql("customer", {"c_custkey": 100_000})
scale_sql("supplier", {"s_suppkey": 100_000})
scale_sql("events", {"event_id": 10_000_000, "user_id": 1_000_000})

# small dims copied verbatim
for t in ("region", "nation", "part"):
    con.sql(f"copy (select * from '{SRC}/{t}.parquet') "
            f"to '{OUT}/{t}.parquet' (format parquet)")

# documents: word-level deterministic mutation per copy
docs = pq.read_table(f"{SRC}/documents.parquet").to_pylist()
out_rows = []
for i in range(COPIES):
    for r in docs:
        row = dict(r)
        row["doc_id"] = r["doc_id"] + i * 1_000_000
        if i > 0 and r["text"] is not None:  # null text stays null
            words = r["text"].split(" ")
            # rewrite every 6th word (phase varies by doc) so
            # cross-copy shingle overlap drops below dedup thresholds
            phase = (r["doc_id"] + i) % 6
            words = [f"mut{i}x{j}" if j % 6 == phase else w
                     for j, w in enumerate(words)]
            row["text"] = " ".join(words)
            row["n_chars"] = len(row["text"])
        out_rows.append(row)
pq.write_table(pa.Table.from_pylist(
    out_rows, schema=pq.read_schema(f"{SRC}/documents.parquet")),
    f"{OUT}/documents.parquet")
print(f"documents: {len(out_rows)} rows")

# embeddings: cyclic rotation per copy (norm-preserving)
emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pylist()
out_rows = []
for i in range(COPIES):
    for r in emb:
        row = dict(r)
        row["vec_id"] = r["vec_id"] + i * 1_000_000
        if i > 0:
            v = r["embedding"]
            k = (i * len(v)) // COPIES
            row["embedding"] = v[k:] + v[:k]
        out_rows.append(row)
pq.write_table(pa.Table.from_pylist(
    out_rows, schema=pq.read_schema(f"{SRC}/embeddings.parquet")),
    f"{OUT}/embeddings.parquet")
print(f"embeddings: {len(out_rows)} rows")
print(f"wrote {OUT}")
