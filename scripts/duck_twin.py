#!/usr/bin/env python
"""Same-box DuckDB twin for bench.py: time every HEADLINE query's
oracle SQL on the same parquet, min-of-2, and write DUCK_DETAIL.json.

This is the harness behind BASELINE.md's "engine X s vs DuckDB Y s"
rows — the driver's 2x bar is defined against same-box DuckDB on
identical queries and data, so the twin must follow bench.py's
protocol: same SF directory, min-of-N (default 2), results fully
materialized (fetchall — the analog of bench.py's noop write), one
process, queries in HEADLINE order.

Usage:
    python scripts/duck_twin.py                  # sf0.1, writes DUCK_DETAIL.json
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/duck_twin.py
    DUCK_QUERIES=a,b,c python scripts/duck_twin.py   # subset, MERGES into
                                                     # the existing detail file
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]

import duckdb

from bench import HEADLINE
from storm_bench_spark.plans.registry import all_oracles
from storm_bench_spark.sources.tables import TABLES

DETAIL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "DUCK_DETAIL.json")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    sel = os.environ.get("DUCK_QUERIES")
    names = [q.strip() for q in sel.split(",")] if sel else list(HEADLINE)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = all_oracles()

    timings: dict[str, float] = {}
    for name in names:
        sql = oracles[name]
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s (min of {runs})", file=sys.stderr)

    runs_by_query = {n: runs for n in names}
    if sel:
        # subset mode merges: keep the full-run rows, replace the
        # re-measured ones, recompute the total over the merged table.
        # Without an existing full-run detail file the "merge" would
        # silently write a subset-only sum under the full-run metric
        # name — refuse, like the cross-SF case.
        if not os.path.exists(DETAIL):
            raise SystemExit(
                "DUCK_QUERIES subset mode needs an existing full-run "
                "DUCK_DETAIL.json to merge into — run the full twin "
                "first (unset DUCK_QUERIES)"
            )
        prev = json.load(open(DETAIL))
        if prev.get("sf") != sf:
            raise SystemExit(
                f"refusing to merge sf={sf} rows into DUCK_DETAIL.json "
                f"measured at sf={prev.get('sf')} — run the full twin "
                f"instead, or point SPARK_GRAFT_SF_DIR at the same SF"
            )
        merged = dict(prev.get("queries", {}))
        merged.update(timings)
        timings = merged
        prev_rbq = prev.get("runs_by_query") or {
            n: prev.get("runs") for n in prev.get("queries", {})
        }
        prev_rbq.update(runs_by_query)
        runs_by_query = prev_rbq

    payload = {
        "metric": "duckdb_oracle_total_wall_samebox",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf,
        "runs": runs,
        "runs_by_query": runs_by_query,
        "queries": timings,
    }
    with open(DETAIL, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in payload.items() if k != "queries"}))


if __name__ == "__main__":
    main()
