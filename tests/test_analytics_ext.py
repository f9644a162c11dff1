"""Operator-level contracts for the analytics extensions (gap fill,
SCD2, funnel) — the registry-wide oracle test already replays the
registered queries; these pin the semantics the oracle can't isolate.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from storm_bench_spark.operators.cdc import scd2_intervals


def _changes(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, sec=s, cid=c, op=op, val=v) for (k, s, c, op, v) in rows]
    )


def test_scd2_upserts_chain_and_current_flag(spark):
    ch = _changes(
        spark,
        [("a", 10, 1, "upsert", "v1"), ("a", 20, 2, "upsert", "v2"), ("a", 30, 3, "upsert", "v3")],
    )
    out = sorted(
        map(
            tuple,
            scd2_intervals(ch, ["k"], "sec", "cid", ["val"]).select(
                "k", "val", "valid_from", "valid_to", "is_current"
            ).collect(),
        )
    )
    assert out == [
        ("a", "v1", 10, 20, False),
        ("a", "v2", 20, 30, False),
        ("a", "v3", 30, None, True),
    ]


def test_scd2_delete_closes_interval_and_emits_nothing(spark):
    ch = _changes(
        spark,
        [("a", 10, 1, "upsert", "v1"), ("a", 20, 2, "delete", None)],
    )
    out = [
        tuple(r)
        for r in scd2_intervals(ch, ["k"], "sec", "cid", ["val"])
        .select("k", "val", "valid_from", "valid_to", "is_current")
        .collect()
    ]
    # the delete terminates v1's validity at sec=20 and produces no row,
    # leaving the key with NO current version
    assert out == [("a", "v1", 10, 20, False)]


def test_scd2_same_sec_ties_break_on_tie_col(spark):
    ch = _changes(
        spark,
        [("a", 10, 2, "upsert", "late"), ("a", 10, 1, "upsert", "early")],
    )
    out = sorted(
        tuple(r)
        for r in scd2_intervals(ch, ["k"], "sec", "cid", ["val"])
        .select("val", "valid_from", "valid_to", "is_current")
        .collect()
    )
    assert out == [("early", 10, 10, False), ("late", 10, None, True)]


def test_gap_fill_null_before_first_observation(spark, duck):
    # A user's grid rows BEFORE their first event carry NULL, not a
    # value borrowed from another user — check on the real fixture by
    # asserting the engine emits at least one leading-NULL row and the
    # very first grid hour of some user is null (global grid starts at
    # the global min hour, users start later).
    from storm_bench_spark.plans.analytics_ext import gap_fill_hourly
    from tests.conftest import SF_DIR

    out = gap_fill_hourly(spark, SF_DIR)
    n_null = out.where(F.col("value").isNull()).count()
    assert n_null > 0
    # forward fill is monotone: once a user has a non-null value, no
    # later NULL may appear for that user
    regress = (
        out.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("value").isNotNull(), F.col("hb"))).alias("first_v"),
            F.max(F.when(F.col("value").isNull(), F.col("hb"))).alias("last_null"),
        )
        .where(F.col("last_null") > F.col("first_v"))
        .count()
    )
    assert regress == 0
