"""Geo column functions: UTM-ish grid zones, haversine, dead reckoning.

Reference parity (semantics, not code):
- ``zone_index``   ≙ RollingGeoCount.ZoneIndex (RollingGeoCount.java:64-76):
  longitude band ``1 + floor((lng+180)/6)``; latitude letter in 8° bands:
  [-80,-32) → 'C'+floor((lat+80)/8), [-32,8) → 'J'+floor((lat+32)/8),
  [8,72) → 'P'+floor((lat-8)/8), [72,84) → 'X'.
  Out-of-range → 'undefined'; missing coords → 'no_latlng'.
  (Java's (int) cast truncates toward zero; all band offsets are
  non-negative there, so floor() is exact parity.)
- ``haversine_km`` ≙ DistFilterBolt.computeDist (RollingFlightDist.java:172-187),
  sphere radius 6378.137 km.
- ``dead_reckon_*`` ≙ DistFilterBolt.computeLatLong (RollingFlightDist.java:157-170):
  destination point given start, bearing (deg), distance (km).

All pure column expressions — they compile into whole-stage codegen and
cost nothing extra at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6378.137  # RollingFlightDist.java:131
KNOT_TO_KM_PER_SEC = 0.000514444  # RollingFlightDist.java:132

ZONE_NO_LATLNG = "no_latlng"
ZONE_UNDEFINED = "undefined"


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def zone_index(lat, lng) -> Column:
    """Grid-zone string for a coordinate pair; null-safe.

    Returns 'no_latlng' when either coordinate is null, 'undefined' when
    outside lat ∈ [-80, 84) or lng ∈ [-180, 180), else e.g. '31U'.
    """
    lat, lng = _c(lat), _c(lng)
    letter = (
        F.when(lat < -32, F.char(F.ascii(F.lit("C")) + F.floor((lat + 80) / 8)))
        .when(lat < 8, F.char(F.ascii(F.lit("J")) + F.floor((lat + 32) / 8)))
        .when(lat < 72, F.char(F.ascii(F.lit("P")) + F.floor((lat - 8) / 8)))
        .otherwise(F.lit("X"))
    )
    band = (F.floor((lng + 180) / 6) + 1).cast("int").cast("string")
    in_range = (lat >= -80) & (lat < 84) & (lng >= -180) & (lng < 180)
    return (
        F.when(lat.isNull() | lng.isNull(), F.lit(ZONE_NO_LATLNG))
        .when(~in_range, F.lit(ZONE_UNDEFINED))
        .otherwise(F.concat(band, letter))
    )


def haversine_km(lat1, lng1, lat2, lng2) -> Column:
    """Great-circle distance in km on a sphere of radius 6378.137 km."""
    lat1, lng1, lat2, lng2 = _c(lat1), _c(lng1), _c(lat2), _c(lng2)
    dlat = F.radians(lat2 - lat1)
    dlng = F.radians(lng2 - lng1)
    rlat1 = F.radians(lat1)
    rlat2 = F.radians(lat2)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlng / 2) * F.sin(dlng / 2)
    )
    c = 2 * F.atan2(F.sqrt(a), F.sqrt(1 - a))
    return F.lit(EARTH_RADIUS_KM) * c


def dead_reckon_lat(lat, bearing_deg, dist_km) -> Column:
    """Latitude (deg) of the destination point from ``lat`` along ``bearing_deg`` for ``dist_km``."""
    rlat = F.radians(_c(lat))
    rbrg = F.radians(_c(bearing_deg))
    rel = _c(dist_km) / F.lit(EARTH_RADIUS_KM)
    return F.degrees(F.asin(F.sin(rlat) * F.cos(rel) + F.cos(rlat) * F.sin(rel) * F.cos(rbrg)))


def dead_reckon_lng(lat, lng, bearing_deg, dist_km) -> Column:
    """Longitude (deg) of the destination point; pairs with ``dead_reckon_lat``."""
    rlat = F.radians(_c(lat))
    rlng = F.radians(_c(lng))
    rbrg = F.radians(_c(bearing_deg))
    rel = _c(dist_km) / F.lit(EARTH_RADIUS_KM)
    lat2 = F.asin(F.sin(rlat) * F.cos(rel) + F.cos(rlat) * F.sin(rel) * F.cos(rbrg))
    return F.degrees(
        rlng
        + F.atan2(
            F.sin(rbrg) * F.sin(rel) * F.cos(rlat),
            F.cos(rel) - F.sin(rlat) * F.sin(lat2),
        )
    )
