#!/usr/bin/env python
"""Scale smoke: replicate the fact tables R× and check time scales ~linearly.

The bench at sf0.1 proves speed at one size; this proves the SHAPE —
that no query hides a super-linear term (pair blowup, driver collect,
per-key state explosion) that only shows up when the data grows. Fact
tables (events, lineitem, orders) are replicated R× with key remapping
so join/group semantics survive; dimensions stay fixed, as they would
at a real scale-up. Dedup/similarity queries are excluded by design:
replicating documents/embeddings creates exact clones whose pair count
grows quadratically in R — a property of the cloned DATA, not of the
plans (their pair discipline is asserted in tests/test_plans.py and
measured in BASELINE.md instead).

Usage:
    python scripts/scale_smoke.py            # R=10 into /tmp
    SCALE_R=100 python scripts/scale_smoke.py

Prints one JSON line: {"r": R, "queries": {name: {"base_s": .., "scaled_s": ..,
"ratio": ..}}}. ratio ≈ R (or below, where a stage is size-independent)
means linear; ratio >> R flags a super-linear term.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]

from pyspark.sql import functions as F

from storm_bench_spark.plans.registry import all_queries
from storm_bench_spark.session import get_spark
from storm_bench_spark.sources.tables import TABLES, load_table

# fact table → (primary key to remap, foreign keys remapped with it)
FACTS = {
    "events": ("event_id",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
}

QUERIES = [
    "wordcount", "grep", "rolling_count", "rolling_hashtag_count",
    "rolling_geo_count", "rolling_sort", "sol", "pageview_count",
    "dataclean", "unique_visitor", "rolling_latlong", "rolling_flight_dist",
    "adsb_parse", "tpch_q1", "tpch_q3", "tpch_q5",
]


def replicate(spark, src: str, dst: str, r: int) -> None:
    # one shared key stride so orders.o_orderkey and lineitem.l_orderkey
    # remap consistently (copy k of an order keeps its copy-k lineitems)
    stride = (
        load_table(spark, src, "orders")
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
        + 1
    )
    for name in TABLES:
        df = load_table(spark, src, name)
        if name in FACTS:
            copies = []
            for k in range(r):
                c = df
                for key in FACTS[name]:
                    off = k * (stride if "orderkey" in key else _stride(spark, src, name, key))
                    c = c.withColumn(key, F.col(key) + F.lit(off))
                copies.append(c)
            df = copies[0]
            for c in copies[1:]:
                df = df.unionByName(c)
        df.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))


_strides: dict[tuple, int] = {}


def _stride(spark, src, name, key) -> int:
    if (name, key) not in _strides:
        _strides[(name, key)] = (
            load_table(spark, src, name).agg(F.max(key)).collect()[0][0] + 1
        )
    return _strides[(name, key)]


def run(spark, queries, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"# {sf_dir} {name}: {out[name]}s", file=sys.stderr)
    return out


def main() -> None:
    r = int(os.environ.get("SCALE_R", "10"))
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = os.environ.get("SCALE_DST", f"/tmp/spark_graft_scale{r}")
    spark = get_spark(app_name="sbs-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(dst, "_DONE")):
        replicate(spark, src, dst, r)
        open(os.path.join(dst, "_DONE"), "w").write("ok")

    queries = all_queries()
    # warmup (JVM/codegen) on the small side
    spark.range(100_000).selectExpr("sum(id * 2)").collect()
    base = run(spark, queries, src)
    scaled = run(spark, queries, dst)
    report = {
        name: {
            "base_s": base[name],
            "scaled_s": scaled[name],
            "ratio": round(scaled[name] / base[name], 2) if base[name] else None,
        }
        for name in QUERIES
    }
    print(json.dumps({"r": r, "queries": report}))


if __name__ == "__main__":
    main()
