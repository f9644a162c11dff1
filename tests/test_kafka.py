"""Kafka source wiring (SURVEY.md §2.1 row 1) — testable without a broker.

The connector jar is a deploy-time dependency, so these tests pin the
two halves that run before/after the data source itself: the option map
(consumer contract parity with BenchmarkBase.java:61-73,97-100) and the
StringScheme decode projection on a kafka-shaped DataFrame.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from storm_bench_spark.functions.text import word_split
from storm_bench_spark.sources.kafka import (
    decode_kafka_values,
    kafka_source_options,
)


def test_options_match_reference_consumer_contract():
    opts = kafka_source_options("book", "b1:9092,b2:9092", group_id="gid")
    # EarliestTime() parity (BenchmarkBase.java:73)
    assert opts["startingOffsets"] == "earliest"
    assert opts["subscribe"] == "book"
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["kafka.group.id"] == "gid"
    # at-least-once posture: data loss skips, not crashes
    assert opts["failOnDataLoss"] == "false"


def test_options_backpressure_and_validation():
    opts = kafka_source_options("view", "b:9092", max_offsets_per_trigger=1000)
    # max.spout.pending analog (conf/conf.yaml:18)
    assert opts["maxOffsetsPerTrigger"] == "1000"
    with pytest.raises(ValueError):
        kafka_source_options("", "b:9092")
    with pytest.raises(ValueError):
        kafka_source_options("t", "")


def _kafka_shaped(spark):
    # the exact projection the kafka source emits
    rows = [
        Row(
            key=None,
            value=bytearray("the quick fox".encode()),
            topic="book",
            partition=0,
            offset=i,
            timestamp=None,
            timestampType=0,
        )
        for i in range(3)
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "key binary, value binary, topic string, partition int, "
            "offset long, timestamp timestamp, timestampType int"
        ),
    )


def test_decode_is_utf8_string_scheme(spark):
    out = decode_kafka_values(_kafka_shaped(spark))
    assert out.columns == ["value", "timestamp"]
    assert out.schema["value"].dataType.simpleString() == "string"
    assert out.select("value").first()[0] == "the quick fox"


def test_decoded_stream_feeds_topology_plans(spark):
    # the decoded frame drops into any topology's first bolt unchanged:
    # wordcount's split stage over the kafka value column
    out = decode_kafka_values(_kafka_shaped(spark), with_event_time=False)
    words = out.select(F.explode(word_split("value")).alias("word"))
    counts = {r["word"]: r["cnt"] for r in words.groupBy("word").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"the": 3, "quick": 3, "fox": 3}
