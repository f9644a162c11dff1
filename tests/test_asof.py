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


def test_asof_nullable_right_values_stay_whole_row(spark):
    """VERDICT r3 #3: a NULL in one right value column must NOT borrow
    that column from an older right row (whole-row semantics, matching
    DuckDB's native ASOF JOIN). The old per-column last(ignorenulls)
    returned (v=1.0, u=20) for left sec 25 here — a row that never
    existed."""
    import duckdb

    from tests.oracle_utils import assert_frames_match

    left = _df(spark, [(1, 25), (1, 12), (1, 3)], "k long, sec long")
    right = _df(
        spark,
        # sec 10: full row; sec 20: v is NULL, u present — the newest
        # right row at-or-before 25 has v NULL and that NULL must win
        [(1, 10, 1.0, 10), (1, 20, None, 20)],
        "k long, sec long, v double, u long",
    )
    out = asof_join(left, right, ["k"], "sec", ["v", "u"])
    got = {r["sec"]: (r["v_r"], r["u_r"], r["sec_r"]) for r in out.collect()}
    assert got[3] == (None, None, None)
    assert got[12] == (1.0, 10, 10)
    assert got[25] == (None, 20, 20)  # whole newest row, NULL included

    con = duckdb.connect()
    duck = con.execute(
        """
        WITH l(k, sec) AS (VALUES (1, 25), (1, 12), (1, 3)),
             r(k, sec, v, u) AS (VALUES (1, 10, 1.0, 10), (1, 20, NULL, 20))
        SELECT l.k, l.sec, r.v AS v_r, r.u AS u_r, r.sec AS sec_r
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.sec >= r.sec
        """
    ).df()
    spark_pdf = out.select(
        F.col("k").cast("int").alias("k"),
        F.col("sec").cast("int").alias("sec"),
        "v_r",
        F.col("u_r").cast("int").alias("u_r"),
        F.col("sec_r").cast("int").alias("sec_r"),
    ).toPandas()
    assert_frames_match(spark_pdf, duck, "asof_nullable")


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


def test_asof_join_ignores_null_right_timestamps(spark):
    # DuckDB ASOF semantics: b.sec <= a.sec is never true for NULL, so
    # a NULL-timestamp right row must never match (the union-sort
    # window orders NULLS FIRST, which would otherwise make it an
    # always-preceding row)
    left = _df(spark, [(1, 10)], "k long, sec long")
    right = _df(spark, [(1, None, 7.0), (1, 5, 3.0)], "k long, sec long, v double")
    out = asof_join(left, right, ["k"], "sec", ["v"]).collect()
    assert len(out) == 1
    assert out[0]["v_r"] == 3.0  # the NULL-sec row (v=7.0) never wins
    # and with ONLY a NULL-sec right row, nothing matches at all
    right2 = _df(spark, [(1, None, 7.0)], "k long, sec long, v double")
    out2 = asof_join(left, right2, ["k"], "sec", ["v"]).collect()
    assert out2[0]["v_r"] is None and out2[0]["sec_r"] is None


def test_asof_tolerance_nulls_whole_match(spark):
    """A match older than the tolerance nulls BOTH emitted columns
    (whole-struct discard); a fresh match survives untouched."""
    from pyspark.sql import Row

    from storm_bench_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [Row(k="a", sec=100), Row(k="a", sec=5000), Row(k="b", sec=50)]
    )
    right = spark.createDataFrame([Row(k="a", sec=90, val="x")])
    out = {
        (r["k"], r["sec"]): (r["val_r"], r["sec_r"])
        for r in asof_join(
            left, right, ["k"], "sec", ["val"], tolerance_sec=1000
        ).collect()
    }
    assert out[("a", 100)] == ("x", 90)      # gap 10 ≤ 1000: fresh
    assert out[("a", 5000)] == (None, None)  # gap 4910 > 1000: discarded whole
    assert out[("b", 50)] == (None, None)    # no right row at all
