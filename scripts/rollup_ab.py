#!/usr/bin/env python
"""Rollup-vs-rescan A/B with MATERIALIZED daily partials (VERDICT r9 #7).

The registered rollup queries (``bitmap_distinct_weekly_rollup``,
``histogram_quantiles_rollup``) compute their daily partials in-query
because the fixture ships no continuous-aggregate state — so their
fixture wall cannot exhibit the claim they exist for: that at scale a
coarser grain merges from stored partials without re-touching raw
rows. This script creates that state and measures the claim directly:

1. replicate the fixture R× (scripts/scale_smoke.py machinery) —
   R=10 over sf0.1 is the sf1-equivalent point;
2. materialize the DAILY partial tables to parquet at both scales
   (the state a continuous aggregate maintains);
3. time, at each scale:
   (a) weekly-from-partials — read partials, merge, finalize
       (bitmap: bit_or + popcount; histogram: cell-add + cum-window);
   (b) weekly-from-raw — scan events and aggregate at week grain
       (same algebra, no intermediate).

(a) is sized by |days|·|blocks or cells| — its wall should be ~flat in
R. (b) re-scans raw rows — ~linear in R. Also records plain sf1 walls
for the two round-9 sampling/rollup queries without a partial form
(``weighted_sample_per_source``, ``bitmap_retention_daily``) plus the
two A/B'd ones, completing the measured-sf1 coverage of the round-9
additions. Prints ONE JSON line.

The script-local finalize mirrors plans/layout_ops._bitmap_popcount
and plans/sketch_queries.histogram_quantiles_rollup's weekly merge op
for op (kept local so a measurement script never forces a re-gate of
the registered queries).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]

from pyspark.sql import functions as F

from storm_bench_spark.plans.layout_ops import _bitmap_blocks, _bitmap_popcount
from storm_bench_spark.plans.registry import all_queries
from storm_bench_spark.session import get_spark
from storm_bench_spark.sources import derived as D
from storm_bench_spark.sources.tables import load_table

N_HIST_BINS = 256
_HIST_QS = (("p50", 0.50), ("p95", 0.95), ("p99", 0.99))


def _timed(fn, runs: int = 3) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _daily_bitmap(spark, sf_dir):
    es = D.events_sec(spark, sf_dir).select(
        F.expr("sec div 86400").alias("day"), "user_id"
    )
    return _bitmap_blocks(es, ["day"], "user_id")


def _daily_hist_cells(spark, sf_dir):
    B = N_HIST_BINS
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(F.expr("CAST(ts AS LONG) div 86400").alias("day"), "value")
    )
    bounds = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    b = ev.crossJoin(F.broadcast(bounds))
    bin_col = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(B - 1),
                F.floor(
                    (F.col("value") - F.col("mn")) * F.lit(float(B))
                    / (F.col("mx") - F.col("mn"))
                ),
            )
        )
        .cast("long")
    )
    return (
        b.select("day", bin_col.alias("bin"), "mn", "mx")
        .groupBy("day", "bin", "mn", "mx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _hist_finalize(weekly):
    """Weekly cells → quantile rows (mirror of the registered query's
    closing window + per-quantile selects)."""
    from pyspark.sql.window import Window

    B = N_HIST_BINS
    wcum = Window.partitionBy("week").orderBy("bin")
    wall = Window.partitionBy("week")
    cum = weekly.select(
        "week", "bin", "mn", "mx",
        F.sum("cnt").over(wcum).alias("c"),
        F.sum("cnt").over(wall).alias("n_rows"),
    )
    outs = []
    for label, q in _HIST_QS:
        sel = (
            cum.where(F.col("c") >= F.lit(q) * F.col("n_rows"))
            .groupBy("week", "mn", "mx")
            .agg(F.min("bin").alias("bin"), F.min("n_rows").alias("n_rows"))
        )
        outs.append(
            sel.select(
                "week",
                F.lit(label).alias("q"),
                F.round(
                    F.col("mn")
                    + (F.col("mx") - F.col("mn")) * F.col("bin").cast("double")
                    / F.lit(float(B)),
                    6,
                ).alias("est"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def measure_scale(spark, sf_dir: str, tag: str, state_root: str) -> dict:
    out: dict = {}

    # --- bitmap weekly distinct -----------------------------------------
    bpath = os.path.join(state_root, tag, "bitmap_daily.parquet")
    _daily_bitmap(spark, sf_dir).write.mode("overwrite").parquet(bpath)
    daily = spark.read.parquet(bpath)
    out["bitmap_daily_rows"] = daily.count()

    def from_partials():
        weekly = (
            daily.select(F.expr("day div 7").alias("week"), "blk", "bm")
            .groupBy("week", "blk")
            .agg(F.bit_or("bm").alias("bm"))
        )
        _noop(_bitmap_popcount(weekly, ["week"]))

    def from_raw():
        es = D.events_sec(spark, sf_dir).select(
            F.expr("(sec div 86400) div 7").alias("week"), "user_id"
        )
        _noop(_bitmap_popcount(_bitmap_blocks(es, ["week"], "user_id"), ["week"]))

    out["bitmap_weekly_from_partials_s"] = _timed(from_partials)
    out["bitmap_weekly_from_raw_s"] = _timed(from_raw)

    # --- histogram weekly quantiles --------------------------------------
    hpath = os.path.join(state_root, tag, "hist_daily_cells.parquet")
    _daily_hist_cells(spark, sf_dir).write.mode("overwrite").parquet(hpath)
    cells = spark.read.parquet(hpath)
    out["hist_daily_cells_rows"] = cells.count()

    def h_from_partials():
        weekly = (
            cells.select(F.expr("day div 7").alias("week"), "bin", "mn", "mx", "cnt")
            .groupBy("week", "bin", "mn", "mx")
            .agg(F.sum("cnt").alias("cnt"))
        )
        _noop(_hist_finalize(weekly))

    out["hist_weekly_from_partials_s"] = _timed(h_from_partials)

    # raw comparator = the registered query itself (daily pass + merge,
    # all from raw — what a warehouse without the intermediate does)
    queries = all_queries()

    def h_from_raw():
        _noop(queries["histogram_quantiles_rollup"](spark, sf_dir))
        spark.catalog.clearCache()

    out["hist_weekly_from_raw_s"] = _timed(h_from_raw)

    # --- plain sf-walls for the round-9 additions ------------------------
    for name in (
        "weighted_sample_per_source",
        "bitmap_retention_daily",
        "bitmap_distinct_weekly_rollup",
        "histogram_quantiles_rollup",
    ):
        def run(n=name):
            _noop(queries[n](spark, sf_dir))
            spark.catalog.clearCache()

        out[f"{name}_s"] = _timed(run)
    return out


def main() -> None:
    r = int(os.environ.get("SCALE_R", "10"))
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = os.environ.get("SCALE_DST", f"/tmp/spark_graft_scale{r}")
    state_root = os.environ.get("ROLLUP_STATE", "/tmp/spark_graft_rollup_ab")
    spark = get_spark(app_name="sbs-rollup-ab")
    spark.sparkContext.setLogLevel("ERROR")

    from scripts.scale_smoke import ensure_replica

    if ensure_replica(spark, src, dst, r):
        print(f"# built R={r} replica at {dst}", file=sys.stderr)

    base = measure_scale(spark, src, "base", state_root)
    scaled = measure_scale(spark, dst, f"r{r}", state_root)
    slopes = {
        k.removesuffix("_s"): round(scaled[k] / base[k], 2)
        for k in base
        if k.endswith("_s") and base[k] > 0
    }
    print(json.dumps({"r": r, "base": base, "scaled": scaled,
                      "slope_x": slopes}))


if __name__ == "__main__":
    main()
