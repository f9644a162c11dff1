"""Scale-technique operators: salting equivalence, bucketed join plans."""

import os
import tempfile

from pyspark.sql import functions as F

from storm_bench_spark.operators.skew import salted_agg, salted_join
from storm_bench_spark.sources.bucketing import read_table, write_bucketed
from storm_bench_spark.sources.derived import pageviews
from tests.conftest import SF_DIR


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    pv = pageviews(spark, SF_DIR).select("event_id", "url", "user_id")
    dim = spark.createDataFrame(
        [("foo.com", "landing"), ("foo.news.com", "news")],
        schema="url string, kind string",
    )
    plain = pv.join(dim, ["url"], "inner")
    salted = salted_join(pv, dim, ["url"], n_salt=4)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)
    # left join keeps unmatched fact rows exactly once
    plain_l = pv.join(dim, ["url"], "left")
    salted_l = salted_join(pv, dim, ["url"], n_salt=4, how="left")
    assert _sorted_rows(salted_l.select(*plain_l.columns)) == _sorted_rows(plain_l)


def test_salted_agg_equals_plain_agg(spark):
    pv = pageviews(spark, SF_DIR)
    plain = _sorted_rows(pv.groupBy("url").agg(F.count("*").alias("cnt")))
    salted = _sorted_rows(
        salted_agg(
            pv, ["url"],
            [F.count("*").alias("_c")], [F.sum("_c").alias("cnt")],
            n_salt=4,
        )
    )
    assert salted == plain


def test_bucketed_join_has_no_exchange(spark):
    pv = pageviews(spark, SF_DIR).select("event_id", "url", "user_id", "http_status")
    with tempfile.TemporaryDirectory() as d:
        write_bucketed(
            pv, "pv_a", os.path.join(d, "a"), buckets=4,
            bucket_cols=["user_id"], sort_cols=["user_id"],
        )
        write_bucketed(
            pv.select("user_id", "url"), "pv_b", os.path.join(d, "b"),
            buckets=4, bucket_cols=["user_id"], sort_cols=["user_id"],
        )
        # the fixture tables are tiny, so the planner would broadcast
        # (which disables bucketing); force the sort-merge path the
        # technique exists for — at real scale neither side broadcasts
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            a, b = read_table(spark, "pv_a"), read_table(spark, "pv_b")
            joined = a.join(b, "user_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # co-located buckets: the join needs no shuffle on either side
            assert "Exchange hashpartitioning" not in plan
            assert "SortMergeJoin" in plan
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS pv_a")
            spark.sql("DROP TABLE IF EXISTS pv_b")
