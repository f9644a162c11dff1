"""Windowed-aggregation operators (the SlidingWindow/Slots replacement).

The reference maintains sliding windows by hand (slot ring + monoid
merge + tick emission — SlidingWindow.java:32-187). Here a sliding
window is one declarative ``groupBy(window(ts, W, S), keys)``: Catalyst
plans partial/final aggregation automatically and, in streaming mode,
the state store holds the per-window partials with watermark eviction
(the analog of wipeZeros — SlidingWindow.java:148-158).

Window starts are emitted as ``ws`` — BIGINT epoch seconds — so results
are engine-neutral and oracle-comparable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sliding_agg(
    df: DataFrame,
    window_sec: int,
    slide_sec: int,
    keys: Sequence[str],
    aggs: Sequence[Column],
    sec_col: str = "sec",
) -> DataFrame:
    """Sliding event-time window aggregation over an epoch-seconds column.

    Enforces the reference's validity rule (window length a multiple of
    the slide — SlidingWindow.java:43-46, RollingBolt.java:45-47).
    """
    if window_sec % slide_sec != 0:
        raise ValueError("window_sec must be a multiple of slide_sec")
    w = F.window(F.timestamp_seconds(F.col(sec_col)), f"{window_sec} seconds", f"{slide_sec} seconds")
    g = df.groupBy(w.alias("w"), *[F.col(k) for k in keys]).agg(*aggs)
    out_cols = [c for c in g.columns if c != "w"]
    return g.select(F.col("w.start").cast("long").alias("ws"), *out_cols)


def latest_by(df: DataFrame, key_cols: Sequence[str], order_key: Column, payload_cols: Sequence[str]) -> DataFrame:
    """Newest row per key: ``max_by(struct(payload), order_key)``.

    This is the LatLongReducer / flightMap upsert pattern
    (LatLongReducer.java:27-41, RollingFlightDist.java:213-219) as a
    partial-aggregable operator — map-side combine keeps the shuffle at
    one row per key per partition, which is what makes "latest position
    per aircraft" viable at 100 TB (a window-function row_number would
    shuffle every row).
    """
    payload = F.struct(*[F.col(c) for c in payload_cols])
    agg = F.max_by(payload, order_key).alias("_latest")
    g = df.groupBy(*[F.col(k) for k in key_cols]).agg(agg)
    return g.select(*key_cols, *[F.col(f"_latest.{c}").alias(c) for c in payload_cols])
