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


# --- opt-in live-broker end-to-end (VERDICT r8 next #5) -------------------
# The one §2.1 surface the sandbox can never execute is the actual
# readStream.format("kafka").load() against a broker. This test closes
# that seam WHERE A BROKER EXISTS; in the sandbox it skips cleanly.
#
# To run it:
#   1. have a reachable broker and export KAFKA_BOOTSTRAP=host:9092
#   2. have kafka-python installed (produces the fixture sentences)
#   3. launch pytest with the connector on the JVM classpath, e.g.
#      PYSPARK_SUBMIT_ARGS='--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 pyspark-shell'
#      (the shared session fixture builds the JVM once per run, so the
#      package must be set BEFORE pytest starts, not per-test)

import os
import uuid

KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")


@pytest.mark.skipif(
    not KAFKA_BOOTSTRAP,
    reason="live-broker test: export KAFKA_BOOTSTRAP=host:9092 (plus "
    "kafka-python and the spark-sql-kafka connector; see module tail)",
)
def test_wordcount_end_to_end_through_live_broker(spark):
    """BenchmarkBase.java:61-73 parity, executed for real: produce the
    fixture sentences to a fresh topic, consume them through
    kafka_stream (earliest offsets, StringScheme decode), run the
    WordCount split+count over the stream, and compare to the exact
    batch counts of what was produced."""
    kafka = pytest.importorskip(
        "kafka", reason="kafka-python is required to produce the fixture"
    )

    from storm_bench_spark.sources.kafka import kafka_stream
    from storm_bench_spark.streaming.streams import run_to_memory

    sentences = [
        "the quick brown fox",
        "the quick fox",
        "the fox jumps over the lazy dog",
    ]
    expect = {}
    for s in sentences:
        for w in s.split():
            expect[w] = expect.get(w, 0) + 1

    topic = f"sbs_live_wc_{uuid.uuid4().hex[:8]}"
    producer = kafka.KafkaProducer(bootstrap_servers=KAFKA_BOOTSTRAP)
    for s in sentences:
        producer.send(topic, s.encode("utf-8"))
    producer.flush()
    producer.close()

    try:
        stream = kafka_stream(spark, topic, KAFKA_BOOTSTRAP)
    except Exception as e:  # noqa: BLE001 — diagnose the classpath gap loudly
        if "kafka" in str(e).lower() and "source" in str(e).lower():
            pytest.fail(
                "broker configured but the spark-sql-kafka connector is "
                "not on the JVM classpath — relaunch pytest with "
                "PYSPARK_SUBMIT_ARGS='--packages "
                "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 "
                "pyspark-shell'"
            )
        raise
    counts = (
        stream.select(F.explode(word_split("value")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = run_to_memory(counts, output_mode="complete")
    got = {r["word"]: r["cnt"] for r in out.collect()}
    assert got == expect
