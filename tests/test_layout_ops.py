"""Unit fixtures for plans/layout_ops.py — the cases the sf-fixture
oracle sweep can't discriminate on its own: block-boundary bitmap ids,
OHLC tie-breaks inside one second, and the Morton interleave pinned
against an independent Python spelling."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from storm_bench_spark.functions.zorder import (
    ZORDER_MASK,
    morton32,
    morton32_py,
    morton32_sql,
)
from storm_bench_spark.plans.layout_ops import (
    BITMAP_BLOCK_BITS,
    _bitmap_blocks,
    _bitmap_popcount,
)


def test_bitmap_distinct_exact_across_block_boundary(spark):
    # ids straddling the 63-bit block edge, with duplicates; bit 62 is
    # the highest used position (the sign bit is deliberately unused).
    ids = [0, 62, 62, 63, 64, 125, 126, 126, 6300]
    df = spark.createDataFrame([(i,) for i in ids], "user_id bigint").withColumn(
        "g", F.lit(1)
    )
    out = _bitmap_popcount(_bitmap_blocks(df, ["g"], "user_id"), ["g"]).collect()
    assert out[0]["n_users"] == len(set(ids))


def test_bitmap_retention_and_popcount(spark):
    # day 0: users {1, 2, 100}; day 1: users {2, 100, 101}; day 2: {63}
    # retained day 0 → {2, 100} = 2. Day 1 → day 2 shares NO user but
    # block 1 exists on both sides (100/101 vs 63): the AND popcounts
    # to 0 and the row must be filtered, matching the oracle's inner
    # join. Exercises multi-block days + the zero-intersection filter.
    rows = [(0, 1), (0, 2), (0, 100), (1, 2), (1, 100), (1, 101), (2, 63)]
    df = spark.createDataFrame(rows, "day bigint, user_id bigint")
    from storm_bench_spark.plans.layout_ops import _bitmap_blocks
    from pyspark.sql import functions as FF

    blocks = _bitmap_blocks(df, ["day"], "user_id")
    nxt = blocks.select(
        (FF.col("day") - 1).alias("day"), "blk", FF.col("bm").alias("bm_next")
    )
    out = (
        blocks.join(nxt, ["day", "blk"])
        .groupBy("day")
        .agg(
            FF.sum(FF.bit_count(FF.col("bm").bitwiseAND(FF.col("bm_next")))).alias(
                "n_retained"
            )
        )
        .where(FF.col("n_retained") > 0)
        .collect()
    )
    got = {r["day"]: r["n_retained"] for r in out}
    assert got == {0: 2}


def test_bitmap_block_math_uses_63_bits():
    # id = 62 must land in block 0 at bit 62; id = 63 in block 1 bit 0.
    assert 62 // BITMAP_BLOCK_BITS == 0 and 62 % BITMAP_BLOCK_BITS == 62
    assert 63 // BITMAP_BLOCK_BITS == 1 and 63 % BITMAP_BLOCK_BITS == 0


def test_ohlc_tie_break_is_event_id_within_second(spark):
    # three events in one hour, two in the SAME second: the packed
    # (sec, event_id) key must make open = lowest event_id of the
    # earliest second and close = highest event_id of the latest second.
    rows = [
        # (event_type, sec, value, event_id)
        ("click", 7200, 5.0, 11),
        ("click", 7200, 9.0, 10),  # same sec, lower id → this is open
        ("click", 7260, 2.0, 12),  # latest sec → close
    ]
    df = spark.createDataFrame(
        rows, "event_type string, sec bigint, value double, event_id bigint"
    )
    b = df.select(
        "event_type",
        F.expr("sec div 3600").alias("hr"),
        "value",
        F.expr("sec * 1000000000 + event_id").alias("ord"),
    )
    out = (
        b.groupBy("event_type", "hr")
        .agg(
            F.min_by("value", "ord").alias("open_v"),
            F.max_by("value", "ord").alias("close_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
        )
        .collect()[0]
    )
    assert out["open_v"] == 9.0  # event_id 10 beats 11 within sec 7200
    assert out["close_v"] == 2.0
    assert out["high_v"] == 9.0 and out["low_v"] == 2.0


def test_morton_three_renderings_agree(spark):
    # Python reference vs DuckDB SQL vs Spark column on edge values.
    cases = [(0, 0), (1, 0), (0, 1), (3, 1), (65535, 0), (0, 65535),
             (65535, 65535), (21845, 43690), (12345, 54321)]
    expected = [morton32_py(x, y) for x, y in cases]
    con = duckdb.connect()
    got_sql = [
        con.execute(f"SELECT {morton32_sql(str(x), str(y))}").fetchone()[0]
        for x, y in cases
    ]
    assert got_sql == expected
    con.close()
    df = spark.createDataFrame(cases, "x bigint, y bigint")
    got_spark = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", morton32(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    assert [got_spark[c] for c in cases] == expected


def test_zorder_write_prunes_on_both_dims(spark, tmp_path):
    # The production claim behind zorder_layout: writing z-sorted makes
    # per-file min/max stats tight in BOTH dims, so a filter on EITHER
    # column skips most files; a single-column sort prunes one dim
    # only. Proven here from the actual parquet footers: a uniform
    # 64×64 grid (scaled to the 16-bit domain) is written 16-ways (a)
    # z-range-sorted and (b) y-then-x sorted, and the files overlapping
    # the predicate x < 1024 are counted from their stats.
    import pathlib

    import pyarrow.parquet as pq

    n = 64
    grid = spark.range(n * n).selectExpr(
        f"CAST((id % {n}) * 1024 AS BIGINT) AS x",
        f"CAST((id DIV {n}) * 1024 AS BIGINT) AS y",
    )
    from storm_bench_spark.sources.sinks import write_zordered

    zdir = str(tmp_path / "zsorted")
    ydir = str(tmp_path / "ysorted")
    write_zordered(grid, zdir, ["x", "y"], n_files=16)
    grid.repartitionByRange(16, "y", "x").sortWithinPartitions("y", "x").write.mode(
        "overwrite"
    ).parquet(ydir)

    def file_ranges(d, col):
        out = []
        for f in pathlib.Path(d).glob("part-*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            idx = md.schema.names.index(col)
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is not None:
                out.append((lo, hi))
        return out

    def overlapping(ranges, cut):
        return sum(1 for lo, _ in ranges if lo < cut)

    zx, yx = file_ranges(zdir, "x"), file_ranges(ydir, "x")
    assert len(zx) >= 8 and len(yx) >= 8  # real multi-file layouts
    # x < 1024 touches one grid column: z-layout must skip most files,
    # the y-sorted layout cannot skip any (every file spans all of x).
    assert overlapping(zx, 1024) <= len(zx) // 2
    assert overlapping(yx, 1024) == len(yx)
    # and the z-layout still prunes on y like the y-sort does
    zy = file_ranges(zdir, "y")
    assert overlapping(zy, 1024) <= len(zy) // 2


def test_morton_interleave_is_bijective_on_low_bits():
    # distinct (x, y) pairs → distinct z (the curve is a bijection on
    # the masked domain — the property file-skipping relies on).
    pts = [(x, y) for x in range(8) for y in range(8)]
    zs = {morton32_py(x, y) for x, y in pts}
    assert len(zs) == len(pts)
    assert max(zs) < (1 << 32) and min(zs) >= 0
    assert ZORDER_MASK == 65535
