"""Kafka source path (SURVEY.md §2.1 row 1).

The reference consumes every topology's input from one Kafka topic,
earliest offset, decoded as a UTF-8 string
(BenchmarkBase.java:61-73: ``SpoutConfig`` + ``StringScheme`` +
``kafka.api.OffsetRequest.EarliestTime()``), with flow control via
``max.spout.pending`` (BenchmarkBase.java:97-100).

Spark-side this is ``readStream.format("kafka")`` with
``startingOffsets=earliest`` and ``CAST(value AS STRING)``;
``maxOffsetsPerTrigger`` is the backpressure analog. The connector jar
(spark-sql-kafka) is a deploy-time dependency not present in this
sandbox, so the module splits cleanly into:

- :func:`kafka_source_options` — pure option wiring (unit-testable);
- :func:`decode_kafka_values`  — the StringScheme projection, a plain
  DataFrame transform (unit-tested on a kafka-shaped frame);
- :func:`kafka_stream`         — the composition that calls ``load()``
  (needs the connector on the classpath; exercised on a real cluster).

Every downstream topology plan takes a DataFrame with a string
``value`` column, so the output of :func:`decode_kafka_values` drops in
exactly where the file-source twins feed them today.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_FORMAT = "kafka"


def kafka_source_options(
    topic: str,
    brokers: str,
    group_id: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Option map for the reference's consumer contract.

    earliest offsets ≙ ``EarliestTime()`` (BenchmarkBase.java:73);
    ``maxOffsetsPerTrigger`` ≙ ``max.spout.pending`` flow control
    (BenchmarkBase.java:97-100, conf/conf.yaml:18);
    ``failOnDataLoss=false`` matches the at-least-once posture of the
    non-Trident topologies (expired offsets skip, not crash).
    """
    if not topic:
        raise ValueError("topic is required")
    if not brokers:
        raise ValueError("brokers is required")
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if group_id is not None:
        # consumer group parity (-group_id CLI flag, BenchmarkBase.java:52)
        opts["kafka.group.id"] = group_id
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def decode_kafka_values(df: DataFrame, with_event_time: bool = True) -> DataFrame:
    """StringScheme: the binary ``value`` payload as UTF-8 ``value``.

    Keeps the broker append ``timestamp`` as the event-time candidate
    (the reference has no event time at all — processing-time ticks —
    so broker time is the faithful default for its windows) and drops
    key/topic/partition/offset, which no topology reads.
    """
    cols = [F.col("value").cast("string").alias("value")]
    if with_event_time:
        cols.append(F.col("timestamp"))
    return df.select(*cols)


def kafka_stream(
    spark: SparkSession,
    topic: str,
    brokers: str,
    **opts,
) -> DataFrame:
    """The composed source: configured reader → load → string decode.

    Requires org.apache.spark:spark-sql-kafka-0-10 on the classpath
    (``--packages`` at submit time); every option is produced by
    :func:`kafka_source_options`, so the wiring itself is covered by
    unit tests even where the connector is absent.
    """
    reader = spark.readStream.format(KAFKA_FORMAT).options(
        **kafka_source_options(topic, brokers, **opts)
    )
    return decode_kafka_values(reader.load())
