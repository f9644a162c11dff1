"""Sinks (SURVEY.md §2.2).

The reference has no real sinks — terminal bolts log and drop
(WordCount.java:93, RollingCountBolt.java:71). The engine therefore
exposes Spark's native sink surface as the declared capability:

- batch: parquet/csv/json writers, with optional hash-partitioned
  layout (``partition_by``) so downstream scans get partition pruning;
- streaming: memory (tests), console (Print parity), file (parquet
  append with checkpoint — exactly-once), and ``foreach_batch_capture``
  for golden-file capture of every micro-batch (the oracle-friendly
  replacement for log-scraping).

At 100 TB the parquet writer is the only one that matters: writes are
per-partition parallel, and ``partition_by`` columns should be
low-cardinality (date, source) — high-cardinality partitioning
produces a small-files explosion.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


def write_batch(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def stream_to_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Exactly-once file sink: checkpoint + idempotent batch commits is
    the engine's Trident ``persistentAggregate`` delivery contract
    (TridentWordCount.java:44-49 → SURVEY.md §2.9)."""
    ckpt = checkpoint or tempfile.mkdtemp(prefix="sbs_sink_ckpt_")
    w = (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def foreach_batch_capture(
    df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str | None = None,
    available_now: bool = True,
    output_mode: str = "update",
):
    """Run ``fn(batch_df, batch_id)`` per micro-batch (golden capture,
    custom upserts, side outputs). ``fn`` must be idempotent per
    batch_id — Spark may re-run a batch after failure."""
    ckpt = checkpoint or tempfile.mkdtemp(prefix="sbs_feb_ckpt_")
    return (
        df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", ckpt)
        .outputMode(output_mode)
        .queryName(f"sbs_feb_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )


def write_zordered(
    df: DataFrame,
    path: str,
    dims: Sequence[str],
    n_files: int = 64,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered write: the production path behind
    ``zorder_layout``'s audit. The two dims are masked to 16 bits,
    Morton-interleaved (functions/zorder.py), and the frame is
    range-partitioned and sorted by the z-value before writing — so
    every output file's min/max stats are tight in BOTH dims and a
    filter on either column prunes files
    (tests/test_layout_ops.py::test_zorder_write_prunes_on_both_dims
    proves this from the written footers). The z column is dropped
    from the output; it is layout, not data.

    ``repartitionByRange`` samples boundaries, so file SIZES are
    balanced even under skewed dims — the property a fixed bit-shift
    bucketing (which zorder_layout's deterministic AUDIT uses) cannot
    promise on skew.
    """
    from pyspark.sql import functions as F

    from storm_bench_spark.functions.zorder import ZORDER_MASK, morton32

    if len(dims) != 2:
        raise ValueError("z-order write takes exactly two dims")
    a = F.col(dims[0]).bitwiseAND(F.lit(ZORDER_MASK))
    b = F.col(dims[1]).bitwiseAND(F.lit(ZORDER_MASK))
    zname = "__z__"
    (
        df.withColumn(zname, morton32(a, b))
        .repartitionByRange(n_files, zname)
        .sortWithinPartitions(zname)
        .drop(zname)
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )
