#!/usr/bin/env python3
#  Copyright (c) 2026 graft contributors
#  SPDX-License-Identifier: Apache-2.0
"""Time the DuckDB oracle over every statement in oracle_sql.json (dev
tool only — the shipped Scala library does not depend on this).

Usage: python3 scripts/oracle_bench.py <sfDir> <verifyOutDir> [outJson]

The bench-vs-baseline ratio in the round verdicts is Spark's BENCH
total divided by THIS number — and the denominator moves (DuckDB got
~2x faster on recursive CTEs between rounds 6 and 7, swinging the
ratio 0.5 -> 0.9 with zero Spark change). Recording the oracle's
cold/warm totals alongside each round's BENCH keeps the ratio a
measurement instead of an inheritance.

Writes one JSON object: cold total, two warm totals, and the per-query
warm times (seconds).
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_all(con, oracle):
    times = {}
    for name in sorted(oracle):
        t0 = time.monotonic()
        con.execute(oracle[name]).fetchall()
        times[name] = round(time.monotonic() - t0, 3)
    return times


def main(sf_dir, out_dir, out_json=None):
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    cold = run_all(con, oracle)
    warm1 = run_all(con, oracle)
    warm2 = run_all(con, oracle)
    result = {
        "sf_dir": sf_dir,
        "n_queries": len(oracle),
        "cold_total_sec": round(sum(cold.values()), 2),
        "warm_total_sec": [round(sum(warm1.values()), 2),
                           round(sum(warm2.values()), 2)],
        "warm_queries": warm1,
    }
    line = json.dumps(result)
    print(line)
    if out_json:
        Path(out_json).write_text(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
