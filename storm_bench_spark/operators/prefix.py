"""Distributed exclusive prefix sum over a key order.

Spark has no built-in scalable running total: a bare
``Window.orderBy(key)`` (no partitionBy) collapses the whole table
into ONE task — fine at test scale, fatal at 100 TB. This operator is
the standard two-phase scan:

1. split the key range into contiguous blocks (floor-divide; one tiny
   min/max driver action, same envelope as flightdist's ``_grid_spec``);
2. per-block totals via a keyed aggregate — a normal parallel shuffle;
   the totals table has ``n_blocks`` rows, so collecting it to compute
   exclusive block offsets is driver-small BY CONSTRUCTION (the same
   bounded-collect justification as the kmeans partials in
   similarity.py);
3. within-block running sums via a KEYED window (partitionBy block) —
   every block scans in parallel — plus the broadcast block offset.

Caveat (documented, by design): blocks are equal-width slices of the
key RANGE, so heavily skewed key distributions give unbalanced blocks.
For dense surrogate ids (the common case for doc/row ids) the split is
even; for skewed keys raise ``n_blocks`` well above the executor count
so stragglers stay small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: Column | str,
    out_col: str = "prefix_sum",
    n_blocks: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = sum of ``value_col`` over all rows with a
    strictly smaller ``order_col`` (exclusive running total).

    ``order_col`` must be unique per row (a surrogate id) — ties would
    make "preceding" ambiguous and the result nondeterministic — and
    NON-NULL (a NULL key has no position in the order; the operator
    raises rather than guessing). NULLs in ``value_col`` count as 0,
    matching ``SUM``'s null-skipping semantics.

    The input is persisted (MEMORY_AND_DISK) for the operator's three
    passes — key-range stats, block totals, and the output itself —
    so an expensive upstream (tokenization, joins) computes ONCE
    instead of once per pass. The cached projection is the input's own
    columns; callers passing a wide df should pre-project. Spark's LRU
    owns eviction after the result materializes.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    if n_blocks is None:
        n_blocks = max(df.sparkSession.sparkContext.defaultParallelism * 4, 8)

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    stats = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if stats is None or stats["lo"] is None:
        return df.withColumn(out_col, F.lit(0).cast("bigint"))
    lo, hi = stats["lo"], stats["hi"]
    width = max((int(hi) - int(lo)) // n_blocks + 1, 1)
    block = ((F.col(order_col) - F.lit(lo)) / F.lit(width)).cast("bigint")

    # NULL values sum as 0 (an all-NULL block would otherwise turn the
    # offset accumulator into None mid-scan)
    with_block = df.withColumn("_blk", block).withColumn(
        "_val", F.coalesce(value.cast("bigint"), F.lit(0))
    )
    rows = with_block.groupBy("_blk").agg(F.sum("_val").alias("_t")).collect()
    if any(r["_blk"] is None for r in rows):
        raise ValueError(
            f"exclusive_prefix_sum: {order_col!r} contains NULLs — the "
            "order key must be non-null (a NULL has no position)"
        )
    totals = sorted(rows, key=lambda r: r["_blk"])
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["_blk"], acc))
        acc += r["_t"]
    off_df = df.sparkSession.createDataFrame(offsets, ["_blk", "_off"])

    w = (
        Window.partitionBy("_blk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum("_val").over(w), F.lit(0))
    return (
        with_block.join(F.broadcast(off_df), "_blk")
        .withColumn(out_col, (F.col("_off") + within).cast("bigint"))
        .drop("_blk", "_val", "_off")
    )
