"""Source/sink format coverage: the engine round-trips its tables
through csv, json, and orc with schema fidelity (SURVEY §2.1-2.2 —
the reference is Kafka-string-only; the engine exposes Spark's full
format surface via sources/sinks.py write_batch + schema'd reads)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from storm_bench_spark.sources.sinks import write_batch
from storm_bench_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _events_sample(spark):
    # project to format-portable columns (csv has no native timestamp
    # fidelity guarantee; epoch seconds are the engine's wire form)
    return (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_id",
            F.col("ts").cast("long").alias("sec"),
            "user_id",
            "event_type",
            "value",
        )
        .limit(200)
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "parquet"])
def test_format_round_trip(spark, fmt):
    df = _events_sample(spark)
    with tempfile.TemporaryDirectory(prefix=f"sbs_fmt_{fmt}_") as d:
        path = os.path.join(d, "t")
        write_batch(df, path, fmt=fmt)
        reader = spark.read.format(fmt)
        if fmt in ("csv", "json"):
            reader = reader.schema(df.schema)
        if fmt == "csv":
            reader = reader.option("header", "false")
        back = reader.load(path)
        assert back.schema == df.schema
        a = sorted(map(tuple, df.collect()))
        b = sorted(map(tuple, back.collect()))
        assert a == b, f"{fmt} round trip lost rows/values"


def test_partitioned_write_prunes(spark):
    df = _events_sample(spark)
    with tempfile.TemporaryDirectory(prefix="sbs_part_") as d:
        path = os.path.join(d, "t")
        write_batch(df, path, fmt="parquet", partition_by=["event_type"])
        back = spark.read.parquet(path).where(F.col("event_type") == "click")
        plan = back._jdf.queryExecution().executedPlan().toString()
        # partition pruning: the click filter must not survive as a
        # data filter — it is resolved at file-listing time
        assert back.count() == df.where(F.col("event_type") == "click").count()
        assert "PartitionFilters: [isnotnull(event_type" in plan
