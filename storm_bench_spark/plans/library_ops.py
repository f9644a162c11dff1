"""Registered queries for the reference's unused-but-present library
operators (SURVEY.md §2 "declared capability surface").

These bolts/functions ship in the reference but are wired into no
topology; they are still capabilities a user of the reference could
build on, so each gets a driver-checked query:

- ``pageview_extract``  ≙ PageView.Extract + PageView.fromString
  (PageView.java:100-122, 48-61): parse the tab-separated wire string
  back into all typed columns (the N-item projection).
- ``expand_words``      ≙ Expand (Expand.java:28-40): flatten an
  iterable value into one row per element.
- ``one_per_key``       ≙ One combiner (One.java:24-39): constant-1
  existence aggregate per key.
- ``print_passthrough`` ≙ Print (Print.java:29-43) / ConstBolt
  identity forward.
- ``adsb_parse``        ≙ LatLongFilterBolt (RollingFlightDist.java:90-114):
  the validating JSON parse — VRS-shaped lines, trailing comma strip,
  required-field null checks, Gnd drop. The Spark side renders JSON and
  parses it back with ``from_json``; the oracle states the equivalent
  relational spec directly, so the round-trip itself is under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storm_bench_spark.functions.parsers import parse_adsb, parse_pageview
from storm_bench_spark.functions.text import WS_RUN_PATTERN, word_split
from storm_bench_spark.plans.registry import register
from storm_bench_spark.sources import derived as D
from storm_bench_spark.sources.tables import load_table

WORDS_SQL = f"list_filter(string_split_regex(text, '{WS_RUN_PATTERN}'), w -> w <> '')"


@register(
    "pageview_extract",
    oracle=f"""
SELECT event_id,
       parts[1] AS url,
       CAST(parts[2] AS INTEGER) AS http_status,
       CAST(parts[3] AS INTEGER) AS zip_code,
       CAST(parts[4] AS INTEGER) AS user_id
FROM (SELECT event_id, string_split(page_view, chr(9)) AS parts
      FROM ({D.PAGEVIEWS_SQL}))
""",
)
def pageview_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the tab-separated pageview wire string into every typed
    column (PageView.Extract's N-item projection; N = all)."""
    pv = D.pageviews(spark, sf_dir).select("event_id", "page_view")
    return pv.select("event_id", parse_pageview("page_view").alias("p")).select(
        "event_id", "p.*"
    )


@register(
    "expand_words",
    oracle=f"""
SELECT doc_id, unnest({WORDS_SQL}) AS word FROM documents
""",
)
def expand_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten the token array into one row per element (Expand)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.explode(word_split("text")).alias("word"))


@register(
    "one_per_key",
    oracle=f"""
SELECT DISTINCT url, 1 AS one FROM ({D.PAGEVIEWS_SQL})
""",
)
def one_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant-1 existence aggregate per key (the One combiner)."""
    pv = D.pageviews(spark, sf_dir)
    return pv.select("url").distinct().withColumn("one", F.lit(1))


@register(
    "print_passthrough",
    oracle=f"SELECT event_id, message FROM ({D.MESSAGES_SQL})",
)
def print_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity forward of the message stream (Print / ConstBolt)."""
    return D.messages(spark, sf_dir).select("event_id", "message")


# --- ADS-B JSON parse (render → from_json → validate) --------------------

# Deterministic fault injection so the validator does real work:
# every 7th record is on the ground (Gnd true), every 11th is missing
# Spd, every 13th line is malformed (no trailing comma → rejected by
# the shape check).
_GND_MOD = 7
_NOSPD_MOD = 11
_MALFORMED_MOD = 13

ADSB_PARSE_ORACLE = f"""
SELECT lpad(CAST(user_id AS VARCHAR), 6, '0') AS icao,
       CAST(sec * 1000 AS BIGINT) AS postime,
       round(value % 5.0, 6) AS lat,
       round((value * 7.0) % 5.0, 6) AS lng,
       round((value * 11.0) % 360.0, 6) AS trak
FROM ({D.EVENTS_SEC_SQL})
WHERE event_id % {_GND_MOD} <> 0
  AND event_id % {_NOSPD_MOD} <> 0
  AND event_id % {_MALFORMED_MOD} <> 0
"""


@register("adsb_parse", oracle=ADSB_PARSE_ORACLE)
def adsb_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render VRS-dump JSON lines from the flight columns, then run the
    full LatLongFilterBolt path: shape check, trailing-comma strip,
    ``from_json`` with the typed schema, required-field null checks,
    Gnd drop.

    The oracle is the *relational spec* of the same result computed
    without JSON, so Spark's render→parse round-trip is what's tested.
    Spd is excluded from the output (it is the injected-null field).

    The repartition spreads the render→parse CPU across the cluster:
    the fixture parquet is a single row group (unsplittable — one scan
    task), and unlike the cheap column-arithmetic queries, ~10 µs/row
    of JSON work dwarfs one small shuffle. Same pattern as reading a
    few huge gzip files.
    """
    fl = D.adsb_flights(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    spd_part = F.when(
        F.col("event_id") % _NOSPD_MOD != 0,
        F.concat(F.lit(',"Spd":'), F.col("spd").cast("string")),
    ).otherwise(F.lit(""))
    gnd = F.when(F.col("event_id") % _GND_MOD == 0, F.lit("true")).otherwise(
        F.lit("false")
    )
    tail = F.when(F.col("event_id") % _MALFORMED_MOD == 0, F.lit("}")).otherwise(
        F.lit("},")
    )
    line = F.concat(
        F.lit('{"Id":1,"Icao":"'),
        F.col("icao"),
        F.lit('","PosTime":'),
        F.col("postime").cast("string"),
        F.lit(',"Lat":'),
        F.col("lat").cast("string"),
        F.lit(',"Long":'),
        F.col("lng").cast("string"),
        spd_part,
        F.lit(',"Trak":'),
        F.col("trak").cast("string"),
        F.lit(',"Gnd":'),
        gnd,
        tail,
    )
    parsed = parse_adsb(fl.select(line.alias("raw")))
    return parsed.select(
        "icao",
        "postime",
        F.round("lat", 6).alias("lat"),
        F.round("lng", 6).alias("lng"),
        F.round("trak", 6).alias("trak"),
    )
