#!/usr/bin/env python
"""Per-query phase breakdown: DataFrame build vs Catalyst vs execution.

Usage:
    python scripts/phase_profile.py <query> [<query> ...]

For each query, after one untimed warm execution (bench protocol), it
times three phases of a fresh run:

- build_s:   Python-side DataFrame construction (plan assembly,
             py4j round-trips per expression);
- plan_s:    analysis + optimization + physical planning (forced via
             queryExecution().executedPlan() without running a job);
- exec_s:    the noop-sink write of the already-planned DataFrame.

The split tells WHICH lever matters for an overhead-dominated row at
bench SF: a large plan_s means Catalyst re-analysis of a giant
expression tree (the r13 ann_rerank failure mode), a large build_s
means py4j chatter from thousands of Column ops, exec_s is the part
data-sized work lives in. Uses the bench session and warmup so numbers
sit beside BENCH_DETAIL rows taken on the same box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from storm_bench_spark.plans.registry import all_queries
    from storm_bench_spark.session import get_spark

    spark = get_spark(app_name="sbs-phase")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"not in the registry: {unknown}")

    from pyspark.sql import functions as F

    from storm_bench_spark.sources.tables import TABLES, load_table

    spark.range(100_000).selectExpr("sum(id * 2)").collect()
    for t in TABLES:
        load_table(spark, sf_dir, t).select(F.lit(1)).limit(1).collect()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        # warm lap for this row (bench protocol: C2 + cache fills)
        spark.sparkContext.setJobDescription(f"warm:{name}")
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

        rec: dict[str, list[float]] = {"build_s": [], "plan_s": [], "exec_s": []}
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"phase:{name}")
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            t1 = time.perf_counter()
            # force analysis + optimization + physical planning only
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            rec["build_s"].append(t1 - t0)
            rec["plan_s"].append(t2 - t1)
            rec["exec_s"].append(t3 - t2)
        spark.catalog.clearCache()
        out[name] = {k: round(min(v), 3) for k, v in rec.items()}
        out[name]["total_s"] = round(sum(out[name].values()), 3)
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
