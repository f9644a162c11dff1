"""DuckDB SQL fragment generators mirroring the engine's column functions.

Each generator emits SQL that performs the SAME floating-point operation
sequence as the matching Spark expression in ``functions/geo.py``, so
oracle comparison is exact up to libm ulp (masked by round-to-6dp in
query outputs).

Double literals use exponent notation (``6378.137e0``) — DuckDB types
bare decimal literals as DECIMAL, which would silently switch the whole
expression to decimal arithmetic.
"""

from __future__ import annotations

R = "6378.137e0"  # EARTH_RADIUS_KM
KNOT = "0.000514444e0"  # KNOT_TO_KM_PER_SEC


def sql_zone(lat: str, lng: str) -> str:
    """Mirror of functions.geo.zone_index."""
    letter = (
        f"CASE WHEN {lat} < -32 THEN chr(CAST(67 + floor(({lat} + 80) / 8) AS INTEGER)) "
        f"WHEN {lat} < 8 THEN chr(CAST(74 + floor(({lat} + 32) / 8) AS INTEGER)) "
        f"WHEN {lat} < 72 THEN chr(CAST(80 + floor(({lat} - 8) / 8) AS INTEGER)) "
        f"ELSE 'X' END"
    )
    band = f"CAST(CAST(floor(({lng} + 180) / 6) + 1 AS INTEGER) AS VARCHAR)"
    return (
        f"CASE WHEN {lat} IS NULL OR {lng} IS NULL THEN 'no_latlng' "
        f"WHEN NOT ({lat} >= -80 AND {lat} < 84 AND {lng} >= -180 AND {lng} < 180) THEN 'undefined' "
        f"ELSE concat({band}, {letter}) END"
    )


def sql_dead_reckon_lat(lat: str, brg: str, dist_km: str) -> str:
    rel = f"({dist_km}) / {R}"
    return (
        f"degrees(asin(sin(radians({lat})) * cos({rel}) "
        f"+ cos(radians({lat})) * sin({rel}) * cos(radians({brg}))))"
    )


def sql_dead_reckon_lng(lat: str, lng: str, brg: str, dist_km: str) -> str:
    rel = f"({dist_km}) / {R}"
    lat2 = (
        f"asin(sin(radians({lat})) * cos({rel}) "
        f"+ cos(radians({lat})) * sin({rel}) * cos(radians({brg})))"
    )
    return (
        f"degrees(radians({lng}) + atan2("
        f"sin(radians({brg})) * sin({rel}) * cos(radians({lat})), "
        f"cos({rel}) - sin(radians({lat})) * sin({lat2})))"
    )


def sql_haversine(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    dlat = f"radians(({lat2}) - ({lat1}))"
    dlng = f"radians(({lng2}) - ({lng1}))"
    a = (
        f"sin(({dlat}) / 2) * sin(({dlat}) / 2) "
        f"+ cos(radians({lat1})) * cos(radians({lat2})) "
        f"* sin(({dlng}) / 2) * sin(({dlng}) / 2)"
    )
    return f"{R} * (2 * atan2(sqrt({a}), sqrt(1 - ({a}))))"
