"""Bucketed-table support: co-located, shuffle-free joins.

Writing both sides of a recurring join bucketed by the join key (same
bucket count) lets Spark plan the join with NO Exchange on either side
— each task joins bucket i against bucket i. At 100 TB this converts
the dominant repeated shuffle of a fact-to-fact join into a metadata
decision; the one-time bucketed write is the amortized cost.

Bucket-count guidance: pick so each bucket is 100-500 MB at the target
scale, and share one bucket count across the tables that join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as an external bucketed parquet table (catalog entry at
    ``table``, files at ``path``). Sorting within buckets additionally
    removes the join's per-task sort."""
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata (and the no-shuffle join plan)
    only applies to catalog tables, not raw ``spark.read.parquet``."""
    return spark.table(table)
