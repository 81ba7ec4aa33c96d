#!/usr/bin/env python3
#  Copyright (c) 2026 graft contributors
#  SPDX-License-Identifier: Apache-2.0
"""Time the DuckDB oracle over every statement in oracle_sql.json (dev
tool only — the shipped Scala library does not depend on this).

Usage: python3 scripts/oracle_bench.py <sfDir> <verifyOutDir> [outJson]

The bench-vs-baseline ratio in the round verdicts is Spark's BENCH
total divided by THIS number — and the denominator moves (DuckDB got
~2x faster on recursive CTEs between rounds 6 and 7, swinging the
ratio 0.5 -> 0.9 with zero Spark change; ORACLE_r11's two "warm" runs
differed 1.67x from host load alone). Two disciplines keep the
denominator a measurement instead of host luck:

- per-query MIN over N>=3 warm passes (steady-state: the minimum is
  the run least contaminated by neighbor load), with every pass's
  total recorded so the spread is visible in the artifact;
- a load SENTINEL (one fixed cheap query re-timed at the start and
  end of the warm window, mirroring Bench.scala's) so a contaminated
  window labels itself.

Writes one JSON object: cold total, each warm pass's total, the
min-of-passes total (the contract denominator), the spread ratio,
the sentinel pair, and per-query min times (seconds).
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

WARM_PASSES = 3
SENTINEL = "q100_zorder_2d"


def run_all(con, oracle):
    times = {}
    for name in sorted(oracle):
        t0 = time.monotonic()
        con.execute(oracle[name]).fetchall()
        times[name] = round(time.monotonic() - t0, 3)
    return times


def time_one(con, sql):
    t0 = time.monotonic()
    con.execute(sql).fetchall()
    return round(time.monotonic() - t0, 3)


def main(sf_dir, out_dir, out_json=None):
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    cold = run_all(con, oracle)
    sentinel_name = SENTINEL if SENTINEL in oracle else (
        sorted(oracle)[0] if oracle else None)
    sentinel_start = (
        time_one(con, oracle[sentinel_name]) if sentinel_name else None)
    warms = [run_all(con, oracle) for _ in range(WARM_PASSES)]
    sentinel_end = (
        time_one(con, oracle[sentinel_name]) if sentinel_name else None)
    per_query_min = {
        name: min(w[name] for w in warms) for name in sorted(oracle)}
    totals = [round(sum(w.values()), 2) for w in warms]
    min_total = round(sum(per_query_min.values()), 2)
    result = {
        "sf_dir": sf_dir,
        "n_queries": len(oracle),
        "cold_total_sec": round(sum(cold.values()), 2),
        "warm_total_sec": totals,
        "warm_min_total_sec": min_total,
        "warm_spread": (round(max(totals) / min(totals), 3)
                        if totals and min(totals) > 0 else None),
        "sentinel": {"query": sentinel_name,
                     "start_sec": sentinel_start,
                     "end_sec": sentinel_end},
        "warm_queries_min": per_query_min,
    }
    line = json.dumps(result)
    print(line)
    if out_json:
        Path(out_json).write_text(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
