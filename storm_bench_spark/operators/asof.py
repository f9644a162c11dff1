"""As-of and interval (range) joins — temporal join operators.

No reference analog (storm-bench's only join is the flight-dist pair
probe); these are the temporal joins a training-data/feature pipeline
needs (point-in-time feature lookup, session stitching), implemented
Spark-first so neither ever materializes a range product:

- :func:`asof_join` is the union-sort trick: tag both inputs, union,
  ONE shuffle on the key, and a running ``last(..., ignorenulls)``
  window ordered by (ts, tag) gives every left row the latest right
  row at-or-before it. O(n log n) per key partition, no row
  replication, no join condition at all — the sort IS the join.
  (A naive range join replicates each left row across every earlier
  right row; Spark's own stream-stream interval join needs two state
  stores. This is the batch-optimal shape.)
- :func:`interval_join` buckets time into ``delta``-wide cells and
  replicates ONE side into its 3-cell neighborhood, so candidates come
  from a hash equi-join on (key, bucket) and the exact |Δt| ≤ delta
  predicate filters after — the same lossless-grid discipline as the
  flight-dist operator (operators/flightdist.py).

DuckDB verifies both: ASOF JOIN is native there, and the interval
oracle is a plain inequality join (fine at oracle scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    sec_col: str,
    value_cols: Sequence[str],
    suffix: str = "_r",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Backward as-of LEFT join: each left row gains the ``value_cols``
    of the latest right row with ``right.sec <= left.sec`` per key
    (inclusive — a right row at the same instant matches).

    ``tolerance_sec`` (pandas ``merge_asof``-style) bounds the lookback:
    a match older than ``left.sec − tolerance_sec`` is discarded — the
    whole struct nulls out at once, so the all-columns-from-one-row
    invariant survives the filter. Applied AFTER the window (a plain
    post-projection conditional), so the join shape and cost are
    unchanged.

    ``right`` must be unique per (key, sec) — pre-reduce it (e.g.
    ``latest_by``) if it is not; with duplicates the winner would be
    sort-order-dependent. The matched right timestamp is emitted as
    ``sec_col + suffix`` (NULL when nothing precedes).

    The right row's values travel as ONE struct through a single
    ``last(ignorenulls=True)``: the struct is non-null whenever the
    right ROW exists, even if every value inside it is NULL, so a NULL
    in one right column can never borrow that column from an older
    right row while taking the rest from the newer one (per-column
    ``last`` does exactly that — DuckDB's native ASOF JOIN semantics
    is whole-row). One window, one shuffle, same O(n log n) shape.
    """
    from pyspark.sql.window import Window

    out_cols = [f"{c}{suffix}" for c in value_cols] + [f"{sec_col}{suffix}"]
    lt = left.withColumn("_tag", F.lit(1))
    # NULL-sec right rows must never match: DuckDB ASOF's b.sec <= a.sec
    # is never true for NULL, but the union-sort window orders NULLS
    # FIRST, which would make such a row an "always preceding" match
    right = right.where(F.col(sec_col).isNotNull())
    rt = right.select(
        *on,
        F.col(sec_col),
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
            F.col(sec_col).alias(f"{sec_col}{suffix}"),
        ).alias("_rv"),
    ).withColumn("_tag", F.lit(0))
    u = lt.unionByName(rt, allowMissingColumns=True)
    # right rows (tag 0) sort before left rows at equal sec ⇒ inclusive
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(sec_col).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("_rv", F.last("_rv", ignorenulls=True).over(w))
    if tolerance_sec is not None:
        fresh = F.col(f"_rv.{sec_col}{suffix}") >= F.col(sec_col) - tolerance_sec
        u = u.withColumn("_rv", F.when(fresh, F.col("_rv")))
    return u.where(F.col("_tag") == 1).select(
        *left.columns,
        *[F.col(f"_rv.{c}").alias(c) for c in out_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    sec_left: str,
    sec_right: str,
    delta_sec: int,
) -> DataFrame:
    """Pairs with ``|left.sec − right.sec| ≤ delta_sec`` per key, via a
    bucket equi-join: right rows replicate into their 3-bucket
    neighborhood, left rows join their own bucket, and the exact
    predicate filters the candidates. Lossless (a qualifying pair's
    buckets differ by ≤1) and never worse than 3× the right side on
    the wire — no range cross product at any scale.

    Preconditions: ``left`` and ``right`` must not share column names
    (the inner equi-join keeps both sides' columns, and the gap
    predicate resolves ``sec_left``/``sec_right`` by name — a shared
    name is ambiguous). Alias/rename before calling, as
    ``interval_click_error`` does with its ``c_sec``/``e_sec`` sides.
    """
    lb = left.withColumn("_b", F.floor(F.col(sec_left) / delta_sec).cast("long"))
    shifts = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("_s")
    rb = right.select("*", shifts).withColumn(
        "_b", (F.floor(F.col(sec_right) / delta_sec) + F.col("_s")).cast("long")
    ).drop("_s")
    joined = lb.join(rb, [*on, "_b"]).drop("_b")
    gap = F.abs(F.col(sec_left) - F.col(sec_right))
    return joined.where(gap <= delta_sec)
