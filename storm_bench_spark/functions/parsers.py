"""Wire-format parsers as column expressions (SURVEY.md §1.3, §2.3).

Each parser turns the reference's single Kafka string column into typed
columns, with the reference's validation rules preserved:

- ``parse_pageview``   ≙ PageView.fromString (PageView.java:48-61):
  tab-split ``url \\t status \\t zip \\t user``.
- ``parse_tweet_text`` ≙ HashtagBolt filtering (RollingHashtagCount.java:52-59):
  pipe-split, require exactly 13 fields, skip records starting '[',
  text is field index 4.
- ``parse_adsb``       ≙ LatLongFilterBolt (RollingFlightDist.java:90-114):
  accept only lines shaped ``{"Id"...},``; strip the trailing comma;
  JSON-decode with the typed ADSB schema.

All built-ins (split/from_json/when) — fully codegen'd, pushdown-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from storm_bench_spark.schemas import ADSB_SCHEMA, TWEET_ARITY, TWEET_TEXT_INDEX


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def parse_pageview(raw) -> Column:
    """Struct(url, http_status, zip_code, user_id) from a tab-separated record."""
    parts = F.split(_c(raw), "\t")
    return F.struct(
        parts.getItem(0).alias("url"),
        parts.getItem(1).cast("int").alias("http_status"),
        parts.getItem(2).cast("int").alias("zip_code"),
        parts.getItem(3).cast("int").alias("user_id"),
    )


def parse_tweet_text(raw) -> Column:
    """Tweet text (field 4 of 13 pipe-separated), null for malformed records.

    Malformed = wrong arity or record starting with '[' — the reference
    skips both (RollingHashtagCount.java:52-59).
    """
    raw = _c(raw)
    parts = F.split(raw, r"\|")
    ok = (~raw.startswith("[")) & (F.size(parts) == TWEET_ARITY)
    return F.when(ok, parts.getItem(TWEET_TEXT_INDEX))


def parse_adsb(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Validated typed ADS-B rows from VRS JSON dump lines.

    Keeps only lines shaped ``{"Id"...},`` (trailing comma stripped),
    with all of Icao/PosTime/Lat/Long/Spd/Trak non-null and Gnd not
    true; returns columns (icao, postime, lat, lng, spd, trak).
    """
    raw = F.col(raw_col)
    shaped = raw.startswith('{"Id"') & raw.endswith("},")
    json_str = F.expr(f"substring({raw_col}, 1, length({raw_col}) - 1)")
    # explode(array(...)) materializes the parsed struct as a concrete
    # attribute (Generate is an optimizer barrier): without it, project
    # collapsing + filter pushdown would substitute the from_json
    # expression into every downstream field reference and re-parse the
    # JSON ~13x per row.
    parsed = df.where(shaped).select(
        F.explode(F.array(F.from_json(json_str, ADSB_SCHEMA))).alias("j")
    )
    required = ["Icao", "PosTime", "Lat", "Long", "Spd", "Trak"]
    cond = F.lit(True)
    for name in required:
        cond = cond & F.col(f"j.{name}").isNotNull()
    cond = cond & ~F.coalesce(F.col("j.Gnd"), F.lit(False))
    return parsed.where(cond).select(
        F.col("j.Icao").alias("icao"),
        F.col("j.PosTime").alias("postime"),
        F.col("j.Lat").alias("lat"),
        F.col("j.Long").alias("lng"),
        F.col("j.Spd").alias("spd"),
        F.col("j.Trak").alias("trak"),
    )
