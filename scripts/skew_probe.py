"""Empirical window-skew probe for line_dedup's r11 dense-rank respell
(VERDICT r11 next #3).

The r11 bound at plans/scrub_ops.py:strip_common_segments is analytic:
the digest-window's per-partition exposure is bounded by STRIDE-ALIGNED
duplication mass (a hot key needs the same ``seg_tokens`` words at the
same offset mod ``seg_tokens``), categorically below a rank-1 Zipf
gram's corpus-constant mass. This probe plants the worst realistic
case — an IDENTICAL seg-aligned prefix (2 segments wide) in f of N
documents — at R=10 and R=100, then measures:

- the window stage's per-partition INPUT distribution (max / median
  rows), computed exactly: HashPartitioning routes by
  pmod(murmur3(key), P), which is ``pmod(hash(key), P)`` in SQL; and
- min-of-3 wall for strip_common_segments, planted vs unplanted.

Planted mass per hot key is f·N rows (one per planted doc per prefix
segment); the probe records whether that stays at/below the median
partition's organic volume and whether wall moves, i.e. whether the
documented fallback spelling (two-phase countDistinct + broadcast
boiler probe) is ever needed.

Usage: python scripts/skew_probe.py  (writes fixtures under /tmp,
prints one JSON line; paste the numbers into BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from storm_bench_spark.functions.text import word_split  # noqa: E402
from storm_bench_spark.plans.scrub_ops import (  # noqa: E402
    LINE_SEG_TOKENS,
    strip_common_segments,
)
from storm_bench_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
F_PLANT = 10  # plant the prefix in every F_PLANT-th doc (f = 10%)
PREFIX_SEGS = 2  # prefix width in segments


def build(spark, r: int, planted: bool) -> str:
    dst = f"/tmp/skew_probe_r{r}_{'planted' if planted else 'plain'}"
    if os.path.exists(os.path.join(dst, "_SUCCESS_PROBE")):
        return dst
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet")).select(
        "doc_id", "text"
    )
    n = docs.count()
    rep = docs.crossJoin(F.broadcast(spark.range(r).withColumnRenamed("id", "k")))
    rep = rep.select(
        (F.col("doc_id") + F.col("k") * n).alias("doc_id"), "text"
    )
    if planted:
        # identical 20-token prefix, seg-aligned by construction
        # (prepended at offset 0); word_split tokenizes on whitespace
        prefix = " ".join(f"boiler{i:02d}" for i in range(PREFIX_SEGS * LINE_SEG_TOKENS))
        rep = rep.select(
            "doc_id",
            F.when(
                F.col("doc_id") % F_PLANT == 0,
                F.concat(F.lit(prefix + " "), F.col("text")),
            ).otherwise(F.col("text")).alias("text"),
        )
    rep.write.mode("overwrite").parquet(os.path.join(dst, "documents.parquet"))
    open(os.path.join(dst, "_SUCCESS_PROBE"), "w").write("ok")
    return dst


def words_of(spark, d: str):
    return (
        spark.read.parquet(os.path.join(d, "documents.parquet"))
        .select("doc_id", word_split("text").alias("w"))
    )


def window_partition_hist(spark, d: str, p: int) -> dict:
    """Exact input-row distribution of the digest window's exchange:
    the same (doc_id, cid, key) rows strip_common_segments windows,
    bucketed by pmod(hash(key), P) — murmur3, what HashPartitioning
    routes by."""
    from storm_bench_spark.plans.scrub_ops import _chunk_ids

    docs = words_of(spark, d).where(F.size("w") > 0)
    hashes = docs.select(
        "doc_id", "w", F.explode(_chunk_ids(LINE_SEG_TOKENS)).alias("cid")
    ).select(
        F.md5(
            F.array_join(
                F.slice("w", F.col("cid") * LINE_SEG_TOKENS + 1, LINE_SEG_TOKENS),
                " ",
            )
        ).alias("key")
    )
    rows = (
        hashes.groupBy(F.expr(f"pmod(hash(key), {p})").alias("p"))
        .count()
        .orderBy("count")
        .collect()
    )
    counts = [r["count"] for r in rows]
    # the planted prefix's own per-key mass (both segments hash apart,
    # so this is the single-task exposure the respell adds)
    hot = (
        hashes.groupBy("key").count().orderBy(F.desc("count")).limit(2).collect()
    )
    return {
        "partitions": p,
        "total_rows": sum(counts),
        "max_partition": max(counts),
        "median_partition": counts[len(counts) // 2],
        "hot_key_rows": [r["count"] for r in hot],
    }


def time_strip(spark, d: str, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        strip_common_segments(words_of(spark, d)).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return round(best, 3)


def main() -> None:
    spark = get_spark(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out: dict = {"f_plant": f"1/{F_PLANT}", "prefix_segs": PREFIX_SEGS}
    for r in (10, 100):
        plain = build(spark, r, planted=False)
        planted = build(spark, r, planted=True)
        # warm lap per dir, then min-of-3
        time_strip(spark, plain, 1)
        t_plain = time_strip(spark, plain)
        time_strip(spark, planted, 1)
        t_planted = time_strip(spark, planted)
        out[f"r{r}"] = {
            "wall_plain_s": t_plain,
            "wall_planted_s": t_planted,
            "hist_planted": window_partition_hist(spark, planted, p),
        }
        print(f"# r{r}: {out[f'r{r}']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
