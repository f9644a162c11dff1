"""Parquet table loaders for the driver's synthetic testdata (TESTDATA.md).

``load_table(spark, sf_dir, name)`` is the single scan entry point: every
query reads through here so scans stay uniform (schema-on-read parquet →
Catalyst pushdown/pruning applies automatically; ``.explain`` shows
PushedFilters/ReadSchema reaching these scans).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Fixture columns stored as TIMESTAMP(NANOS) in parquet. Spark reads them
# as BIGINT nanos (spark.sql.legacy.parquet.nanosAsLong); we truncate to
# micros with integer division (nanos ≈ 1.7e18 overflows double math) and
# restore TimestampType — the same ns→us truncation DuckDB applies.
_TIMESTAMP_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _TIMESTAMP_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000")))
    return df
