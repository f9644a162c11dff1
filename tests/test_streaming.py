"""Streaming-surface tests: stream/batch parity, stateful operator,
generator spouts (SURVEY.md §5.2 streaming level)."""

import time

from pyspark.sql import functions as F

from storm_bench_spark.plans.registry import all_queries
from storm_bench_spark.streaming.generators import pageview_stream, random_message_stream
from storm_bench_spark.streaming.streams import run_to_memory
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_frames_match


def test_stream_batch_parity_rolling_count(spark):
    qs = all_queries()
    batch = qs["rolling_count"](spark, SF_DIR).toPandas()
    stream = qs["streaming_rolling_count"](spark, SF_DIR).toPandas()
    assert_frames_match(stream, batch, "rolling_count stream/batch parity")


def test_trident_wordcount_equals_batch(spark):
    qs = all_queries()
    batch = qs["wordcount"](spark, SF_DIR).toPandas()
    stream = qs["trident_wordcount"](spark, SF_DIR).toPandas()
    assert_frames_match(stream, batch, "wordcount trident parity")


def test_stateful_running_count_matches_groupby(spark):
    qs = all_queries()
    out = qs["stateful_running_count"](spark, SF_DIR).toPandas()
    from storm_bench_spark.sources.tables import load_table

    expect = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.col("event_type").alias("key"))
        .agg(F.count("*").alias("cnt"))
        .toPandas()
    )
    assert_frames_match(out, expect, "stateful running count")


def _drain_rate_stream(df, min_rows=1, timeout=60.0, query_name="gen_test"):
    """Run the stream until the memory sink holds ``min_rows`` (the rate
    source is wall-clock driven, so a fixed sleep is flaky under load)."""
    spark = df.sparkSession
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + timeout
        while time.time() < deadline:
            if spark.table(query_name).limit(min_rows).count() >= min_rows:
                break
            time.sleep(0.25)
    finally:
        q.stop()
    return spark.table(query_name)


def test_random_message_stream_shape(spark):
    out = _drain_rate_stream(
        random_message_stream(spark, size_bytes=100, rows_per_second=500),
        query_name="gen_msgs",
    ).toPandas()
    assert len(out) > 0
    assert (out["message"].str.len() == 100).all()
    assert out["message"].str.fullmatch(r"\d{100}").all()


def test_pageview_stream_distributions(spark):
    out = _drain_rate_stream(
        pageview_stream(spark, rows_per_second=500), query_name="gen_pv"
    ).toPandas()
    assert len(out) > 0
    assert set(out["url"]) <= {"foo.com", "foo.news.com", "foo.contact.com"}
    assert set(out["http_status"]) <= {200, 404}
    assert (out["page_view"].str.count("\t") == 3).all()
