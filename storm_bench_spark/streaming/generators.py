"""Rate-source generator streams (the reference's synthetic spouts).

Each spout becomes ``spark.readStream.format("rate")`` plus a
deterministic column expression — unbounded, backpressure-aware
(rowsPerSecond), and reproducible, unlike the reference's
Random-seeded spouts:

- ``random_message_stream`` ≙ RandomMessageSpout.java:49-78 (pool of
  100 fixed digit-strings of a given byte size)
- ``pageview_stream``       ≙ PageViewSpout + PageViewGenerator.java:37-50
  (url 70/20/10, status 95/5, zip 50/50, user uniform [0,100))
- ``file_replay_stream``    ≙ FileReadSpout.java:32-85 (cyclic line
  replay: rate source joined to the file by row index modulo)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _rate(spark: SparkSession, rows_per_second: int) -> DataFrame:
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )  # columns: timestamp, value (monotone bigint)


def random_message_stream(
    spark: SparkSession, size_bytes: int = 100, rows_per_second: int = 1000
) -> DataFrame:
    """Digit-string messages of ``size_bytes`` chars from a fixed pool of 100.

    Pool entry i = decimal digits of the md5-derived integer of i,
    repeated to length — deterministic, full pool coverage via value%100.
    """
    pool_idx = (F.col("value") % 100).cast("string")
    digits = F.conv(F.substring(F.md5(pool_idx), 1, 15), 16, 10)  # ≤19 digits
    reps = (size_bytes // 19) + 2
    msg = F.substring(F.repeat(digits, reps), 1, size_bytes)
    return _rate(spark, rows_per_second).select(
        F.col("timestamp").alias("event_time"), msg.alias("message")
    )


def pageview_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """PageViewGenerator's weighted categoricals from the rate sequence."""
    v = F.col("value")
    url = (
        F.when(v % 10 < 7, F.lit("foo.com"))
        .when(v % 10 < 9, F.lit("foo.news.com"))
        .otherwise(F.lit("foo.contact.com"))
    )
    status = F.when(v % 20 == 0, F.lit(404)).otherwise(F.lit(200))
    zipc = F.when(v % 2 == 0, F.lit(94709)).otherwise(F.lit(94117))
    user = (v % 100).cast("int")
    raw = F.concat_ws(
        "\t", url, status.cast("string"), zipc.cast("string"), user.cast("string")
    )
    return _rate(spark, rows_per_second).select(
        F.col("timestamp").alias("event_time"),
        url.alias("url"),
        status.alias("http_status"),
        zipc.alias("zip_code"),
        user.alias("user_id"),
        raw.alias("page_view"),
    )


def file_replay_stream(
    spark: SparkSession, path: str, rows_per_second: int = 1000
) -> DataFrame:
    """Cyclic replay of a text file: line ``value % line_count`` per tick.

    The broadcast-joined line table replaces FileReader's rewind loop
    (FileReader.java:45-52); the stream never exhausts.
    """
    # Index the lines driver-side: the replay file is small by contract
    # (FileReadSpout reads a classpath resource), and expressions like
    # monotonically_increasing_id/row_number are rejected inside a
    # streaming plan even on the static join side.
    rows = spark.read.text(path).collect()
    lines = spark.createDataFrame(
        [(i, r.value) for i, r in enumerate(rows)],
        schema="idx long, sentence string",
    )
    n = len(rows)
    rate = _rate(spark, rows_per_second).withColumn("idx", F.col("value") % n)
    return rate.join(F.broadcast(lines), "idx").select(
        F.col("timestamp").alias("event_time"), "sentence"
    )
