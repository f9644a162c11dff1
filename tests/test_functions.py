"""Unit tests for the column-function library on literal DataFrames,
covering the reference's validation rules (SURVEY.md §5.2)."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from storm_bench_spark.functions.geo import haversine_km, zone_index
from storm_bench_spark.functions.hashing import hash64
from storm_bench_spark.functions.parsers import parse_adsb, parse_pageview, parse_tweet_text
from storm_bench_spark.functions.text import extract_hashtags, word_split


def test_zone_index_bands_and_sentinels(spark):
    rows = [
        # (lat, lng, expected) — band math from RollingGeoCount.java:64-76
        (0.0, 0.0, "31N"),       # equator/greenwich: band 31, J+4='N'
        (-80.0, -180.0, "1C"),   # lower corner
        (83.9, 179.9, "60X"),    # top band is 'X'
        (75.0, 0.0, "31X"),
        (-33.0, 0.0, "31H"),     # C..H band: C + floor(47/8)=C+5='H'
        (7.9, 0.0, "31N"),       # J + floor(39.9/8)=J+4='N'
        (71.9, 0.0, "31W"),      # P + floor(63.9/8)=P+7='W'
        (84.0, 0.0, "undefined"),
        (-80.1, 0.0, "undefined"),
        (0.0, 180.0, "undefined"),
        (None, 10.0, "no_latlng"),
        (10.0, None, "no_latlng"),
    ]
    df = spark.createDataFrame(
        [Row(lat=a, lng=b, want=w) for a, b, w in rows],
        schema="lat double, lng double, want string",
    )
    got = df.select(zone_index("lat", "lng").alias("zone"), "want").collect()
    for r in got:
        assert r.zone == r.want, f"{r}"


def test_haversine_known_distance(spark):
    # London (51.5074, -0.1278) ↔ Paris (48.8566, 2.3522) ≈ 343.5 km
    # on the reference's R=6378.137 sphere.
    df = spark.range(1).select(
        haversine_km(F.lit(51.5074), F.lit(-0.1278), F.lit(48.8566), F.lit(2.3522)).alias("d")
    )
    d = df.first().d
    assert math.isclose(d, 343.5, rel_tol=0.01), d
    # zero distance
    z = spark.range(1).select(
        haversine_km(F.lit(10.0), F.lit(20.0), F.lit(10.0), F.lit(20.0)).alias("d")
    ).first().d
    assert z == 0.0


def test_word_split_drops_empties(spark):
    df = spark.createDataFrame([Row(s="  a  b   c "), Row(s=""), Row(s="one")])
    out = df.select(word_split("s").alias("w")).collect()
    assert out[0].w == ["a", "b", "c"]
    assert out[1].w == []
    assert out[2].w == ["one"]


def test_extract_hashtags_rules(spark):
    # '#' alone is too short; words must start with '#' (RollingHashtagCount.java:60-69)
    df = spark.createDataFrame([Row(s="hi #tag x # ##double not#this #a")])
    out = df.select(extract_hashtags("s").alias("h")).first().h
    assert out == ["#tag", "##double", "#a"]


def test_parse_tweet_arity_and_bracket_skip(spark):
    good = "|".join(f"f{i}" for i in range(13))
    bad_arity = "|".join(f"f{i}" for i in range(12))
    bracketed = "[" + good
    df = spark.createDataFrame([Row(raw=good), Row(raw=bad_arity), Row(raw=bracketed)])
    out = df.select(parse_tweet_text("raw").alias("t")).collect()
    assert out[0].t == "f4"
    assert out[1].t is None
    assert out[2].t is None


def test_parse_pageview_roundtrip(spark):
    df = spark.createDataFrame([Row(raw="http://foo.com\t200\t94709\t42")])
    p = df.select(parse_pageview("raw").alias("p")).select("p.*").first()
    assert (p.url, p.http_status, p.zip_code, p.user_id) == ("http://foo.com", 200, 94709, 42)


def test_parse_adsb_validation(spark):
    ok = '{"Id":1,"Icao":"ABC123","PosTime":1500,"Lat":10.0,"Long":20.0,"Spd":400.0,"Trak":90.0,"Gnd":false},'
    gnd = '{"Id":2,"Icao":"DEF456","PosTime":1500,"Lat":10.0,"Long":20.0,"Spd":400.0,"Trak":90.0,"Gnd":true},'
    missing = '{"Id":3,"Icao":"GHI789","PosTime":1500,"Lat":10.0,"Long":20.0,"Trak":90.0},'
    not_shaped = '{"Foo":1},'
    no_comma = '{"Id":4,"Icao":"JKL012","PosTime":1500,"Lat":10.0,"Long":20.0,"Spd":1.0,"Trak":2.0}'
    df = spark.createDataFrame([Row(raw=r) for r in [ok, gnd, missing, not_shaped, no_comma]])
    out = parse_adsb(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.icao, r.postime, r.lat, r.lng, r.spd, r.trak) == ("ABC123", 1500, 10.0, 20.0, 400.0, 90.0)


def test_hash64_matches_duckdb(spark, duck):
    strs = ["", "a", "hello world", "naïve — ünïcode"]
    df = spark.createDataFrame([Row(s=s) for s in strs])
    sp = {r.s: r.h for r in df.select("s", hash64("s").alias("h")).collect()}
    for s in strs:
        dk = duck.execute(
            "SELECT CAST(concat('0x', substr(md5(?), 1, 15)) AS BIGINT)", [s]
        ).fetchone()[0]
        assert sp[s] == dk, s


def test_normalize_text_whitespace_and_case(spark):
    from storm_bench_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(1, "  Hello\t\tWorld \x0b X\n\nY  "), (2, "already clean"), (3, "")],
        "id long, text string",
    )
    out = {r["id"]: r["n"] for r in df.select("id", normalize_text("text").alias("n")).collect()}
    assert out[1] == "hello world x y"  # runs collapse, VT included, trimmed, lowered
    assert out[2] == "already clean"
    assert out[3] == ""


def test_mask_pii_order_and_boundaries(spark):
    from storm_bench_spark.functions.text import mask_pii

    rows = [
        # email-shaped token inside a URL must mask as part of the URL
        (1, "visit https://a.example/u/bob@c.de now"),
        (2, "mail bob.smith+x@sub.example.org please"),
        (3, "call +1 (555) 010-1234 today"),
        # short digit runs (< 8 chars total) must NOT phone-mask
        (4, "room 12 34 floor 5"),
        (5, "no pii here"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r["m"] for r in df.select("id", mask_pii("text").alias("m")).collect()}
    assert out[1] == "visit <URL> now"
    assert out[2] == "mail <EMAIL> please"
    assert out[3] == "call <PHONE> today"
    assert out[4] == "room 12 34 floor 5"
    assert out[5] == "no pii here"


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    from storm_bench_spark.plans.registry import get_spec
    from tests.conftest import SF_DIR

    fn = get_spec("stratified_sample").fn
    a = sorted(r["event_id"] for r in fn(spark, SF_DIR).collect())
    b = sorted(r["event_id"] for r in fn(spark, SF_DIR).collect())
    assert a == b and len(a) > 0  # pure function of the key: identical reruns
    by_type = {
        r["event_type"]: r["cnt"]
        for r in fn(spark, SF_DIR).groupBy("event_type").count().withColumnRenamed("count", "cnt").collect()
    }
    # purchase keeps 100%: must dominate view's 5% on the fixture
    assert by_type.get("purchase", 0) > by_type.get("view", 0)
