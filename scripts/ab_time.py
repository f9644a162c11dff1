#!/usr/bin/env python
"""A/B timing harness for a subset of registry queries.

Usage:
    python scripts/ab_time.py <out_json> <query> [<query> ...]

Mirrors the bench headline per-query protocol exactly (warm lap of 1
untimed run, then min-of-3 timed runs through the noop sink, cache
cleared between queries, engine get_spark session) so numbers are
comparable to BENCH_DETAIL.json rows taken on the same box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]


def main() -> None:
    out, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from storm_bench_spark.plans.registry import all_queries
    from storm_bench_spark.session import get_spark

    spark = get_spark(app_name="sbs-ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"not in the registry: {unknown}")

    # same session warmup as bench.py
    from pyspark.sql import functions as F

    from storm_bench_spark.sources.tables import TABLES, load_table

    spark.range(100_000).selectExpr("sum(id * 2)").collect()
    spark.range(10_000).selectExpr("id % 7 AS k").groupBy("k").count().collect()
    for t in TABLES:
        load_table(spark, sf_dir, t).select(F.lit(1)).limit(1).collect()

    def run_once(fn):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # full warm lap first (bench protocol), then timed lap
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        run_once(queries[name])
        spark.catalog.clearCache()
    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time:{name}")
        samples = [run_once(queries[name]) for _ in range(runs)]
        spark.catalog.clearCache()
        timings[name] = round(min(samples), 3)
        print(f"# {name}: {timings[name]}s  (samples {[round(s,3) for s in samples]})", file=sys.stderr)
    with open(out, "w") as f:
        json.dump(timings, f, indent=1, sort_keys=True)
    print(json.dumps(timings, sort_keys=True))


if __name__ == "__main__":
    main()
