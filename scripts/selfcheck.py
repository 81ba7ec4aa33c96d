#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the
shipped Scala library does not depend on this).

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result, runs the matching SQL
from oracle_sql.json in DuckDB over the same sfDir parquet tables, and
compares: column names (sorted), row count, and cell values (rows sorted
by all columns). Mirrors what the driver's DuckDB hash-compare needs to
pass, so any mismatch here is a mismatch there.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact bits: the driver hashes raw double values, so sub-ulp
        # differences must FAIL here too (9-sig-digit rounding masked
        # the round-1 q10/q51 divergence)
        return v.hex()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(table):
    cols = sorted(table.column_names)
    data = {c: table.column(c).to_pylist() for c in cols}
    rows = [tuple(norm_cell(data[c][i]) for c in cols)
            for i in range(table.num_rows)]
    return cols, sorted(rows)


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = out / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(res_dir)
        duck_tbl = con.execute(oracle[name]).arrow()
        sc, sr = canon(spark_tbl)
        dc, dr = canon(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; "
                  f"first at {i}:\n  spark={a}\n  duck ={b}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sr)} rows, {len(sc)} cols)")
        n_pass += 1
    # queries without an oracle get the driver's weaker rows-only check
    for d in sorted(p.name for p in out.iterdir() if p.is_dir()):
        if d not in oracle:
            n = pq.read_table(out / d).num_rows
            print(f"INFO {d}: no oracle, rows={n}"
                  + (" (EMPTY!)" if n == 0 else ""))
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
