"""Temporal-join operator semantics on hand-built frames: inclusive
as-of ties, no-match nulls, interval-join boundary losslessness."""

from pyspark.sql import functions as F

from storm_bench_spark.operators.asof import asof_join, interval_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema=schema)


def test_asof_backward_inclusive_and_null(spark):
    left = _df(
        spark,
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")],
        "k long, sec long, tag string",
    )
    right = _df(
        spark,
        [(1, 5, 100.0), (1, 20, 200.0), (2, 6, 300.0)],
        "k long, sec long, v double",
    )
    out = {
        r["tag"]: (r["v_r"], r["sec_r"])
        for r in asof_join(left, right, ["k"], "sec", ["v"]).collect()
    }
    assert out["a"] == (100.0, 5)  # latest at-or-before 10 is sec 5
    assert out["b"] == (200.0, 20)  # equal instant matches (inclusive)
    assert out["c"] == (None, None)  # right row is AFTER the left row


def test_asof_left_rows_always_survive(spark):
    left = _df(spark, [(1, 1), (1, 2), (3, 9)], "k long, sec long")
    right = _df(spark, [(2, 1, 7.0)], "k long, sec long, v double")
    out = asof_join(left, right, ["k"], "sec", ["v"])
    assert out.count() == 3
    assert out.where(F.col("v_r").isNotNull()).count() == 0


def test_interval_join_is_lossless_at_bucket_boundaries(spark):
    # pairs straddling a bucket edge must still match: delta=10,
    # sec 9 vs 19 (gap 10, adjacent buckets), 10 vs 21 (gap 11, out)
    left = _df(spark, [(1, 101, 9), (1, 102, 10)], "k long, a_id long, a_sec long")
    right = _df(spark, [(1, 201, 19), (1, 202, 21)], "k long, b_id long, b_sec long")
    out = interval_join(left, right, ["k"], "a_sec", "b_sec", 10)
    pairs = sorted((r["a_id"], r["b_id"]) for r in out.collect())
    assert pairs == [(101, 201), (102, 201)]  # 9↔19 gap 10 in; 9↔21 gap 12 out; 10↔21 gap 11 out


def test_interval_join_emits_each_pair_once(spark):
    # same-bucket pair must not duplicate through the ±1 replicas
    left = _df(spark, [(1, 1, 100)], "k long, a_id long, a_sec long")
    right = _df(spark, [(1, 2, 101)], "k long, b_id long, b_sec long")
    out = interval_join(left, right, ["k"], "a_sec", "b_sec", 50)
    assert out.count() == 1
