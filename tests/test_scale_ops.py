"""Scale-technique operators: salting equivalence, bucketed join plans."""

import os
import tempfile

from pyspark.sql import functions as F

from storm_bench_spark.operators.skew import salted_agg, salted_join
from storm_bench_spark.sources.bucketing import read_table, write_bucketed
from storm_bench_spark.sources.derived import pageviews
from tests.conftest import SF_DIR


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    pv = pageviews(spark, SF_DIR).select("event_id", "url", "user_id")
    dim = spark.createDataFrame(
        [("foo.com", "landing"), ("foo.news.com", "news")],
        schema="url string, kind string",
    )
    plain = pv.join(dim, ["url"], "inner")
    salted = salted_join(pv, dim, ["url"], n_salt=4)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)
    # left join keeps unmatched fact rows exactly once
    plain_l = pv.join(dim, ["url"], "left")
    salted_l = salted_join(pv, dim, ["url"], n_salt=4, how="left")
    assert _sorted_rows(salted_l.select(*plain_l.columns)) == _sorted_rows(plain_l)


def test_salted_agg_equals_plain_agg(spark):
    pv = pageviews(spark, SF_DIR)
    plain = _sorted_rows(pv.groupBy("url").agg(F.count("*").alias("cnt")))
    salted = _sorted_rows(
        salted_agg(
            pv, ["url"],
            [F.count("*").alias("_c")], [F.sum("_c").alias("cnt")],
            n_salt=4,
        )
    )
    assert salted == plain


def test_bucketed_join_has_no_exchange(spark):
    pv = pageviews(spark, SF_DIR).select("event_id", "url", "user_id", "http_status")
    with tempfile.TemporaryDirectory() as d:
        write_bucketed(
            pv, "pv_a", os.path.join(d, "a"), buckets=4,
            bucket_cols=["user_id"], sort_cols=["user_id"],
        )
        write_bucketed(
            pv.select("user_id", "url"), "pv_b", os.path.join(d, "b"),
            buckets=4, bucket_cols=["user_id"], sort_cols=["user_id"],
        )
        # the fixture tables are tiny, so the planner would broadcast
        # (which disables bucketing); force the sort-merge path the
        # technique exists for — at real scale neither side broadcasts
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            a, b = read_table(spark, "pv_a"), read_table(spark, "pv_b")
            joined = a.join(b, "user_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # co-located buckets: the join needs no shuffle on either side
            assert "Exchange hashpartitioning" not in plan
            assert "SortMergeJoin" in plan
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS pv_a")
            spark.sql("DROP TABLE IF EXISTS pv_b")


def _synthetic_latest(spark, n_per_cluster=12):
    """Fresh latest-position snapshot: two clusters ~2000 km apart, so a
    lossless grid must separate them while keeping intra-cluster pairs."""
    now_ms = 1_700_000_000_000
    rows = []
    for c, (lat0, lng0) in enumerate([(10.0, 10.0), (10.0, 30.0)]):
        for i in range(n_per_cluster):
            rows.append(
                (
                    f"{c}{i:05d}",
                    now_ms - (i % 5) * 1000,
                    lat0 + (i % 4) * 0.05,
                    lng0 + (i // 4) * 0.05,
                    100.0 + i,
                    float((37 * i) % 360),
                )
            )
    return spark.createDataFrame(
        rows, schema="icao string, postime long, lat double, lng double, spd double, trak double"
    )


def test_bucketed_flight_dist_equals_unbucketed(spark):
    from storm_bench_spark.operators.flightdist import (
        _grid_spec,
        flight_dist_from_latest,
        flight_dist_from_latest_bucketed,
    )

    latest = _synthetic_latest(spark)
    spec = _grid_spec(latest, 30.0, 3, 5)
    assert spec is not None and (spec[0] > 3 or spec[1] > 3), (
        "fixture must exercise the grid path, not the fallback"
    )
    plain = flight_dist_from_latest(latest, 30.0, 3, 5)
    bucketed = flight_dist_from_latest_bucketed(latest, 30.0, 3, 5)
    key = lambda r: (r["icao1"], r["icao2"], r["step"])
    pr = sorted(plain.collect(), key=key)
    br = sorted(bucketed.collect(), key=key)
    assert len(pr) > 0, "threshold must keep intra-cluster pairs"
    assert [key(r) for r in pr] == [key(r) for r in br]
    for p, b in zip(pr, br):
        assert abs(p["dist_km"] - b["dist_km"]) < 1e-9


def _assert_bucketed_equals_plain(spark, rows, threshold_km):
    from storm_bench_spark.operators.flightdist import (
        flight_dist_from_latest,
        flight_dist_from_latest_bucketed,
    )

    latest = spark.createDataFrame(
        rows, schema="icao string, postime long, lat double, lng double, spd double, trak double"
    )
    plain = flight_dist_from_latest(latest, threshold_km, 3, 5)
    bucketed = flight_dist_from_latest_bucketed(latest, threshold_km, 3, 5)
    key = lambda r: (r["icao1"], r["icao2"], r["step"])
    pr = sorted(plain.collect(), key=key)
    br = sorted(bucketed.collect(), key=key)
    assert [key(r) for r in pr] == [key(r) for r in br]
    for p, b in zip(pr, br):
        assert abs(p["dist_km"] - b["dist_km"]) < 1e-9
    return pr


def test_bucketed_flight_dist_near_polar_antipodal(spark):
    """VERDICT r3 #1: near-polar snapshots (|lat| > 85°) must fall back
    to the all-pairs join — at lat 89.5° two aircraft at antipodal
    longitudes are ~111 km apart (over the pole) while any longitude
    grid puts them in far-apart cells. The grid spec must refuse."""
    from storm_bench_spark.operators.flightdist import _grid_spec

    now_ms = 1_700_000_000_000
    rows = [
        ("AAA001", now_ms, 89.5, 0.0, 100.0, 0.0),
        ("AAA002", now_ms, 89.5, 179.5, 100.0, 180.0),
        ("AAA003", now_ms, 89.3, -90.0, 120.0, 45.0),
        ("AAA004", now_ms - 2000, -89.5, 10.0, 100.0, 0.0),
        ("AAA005", now_ms - 1000, -89.4, -170.0, 150.0, 90.0),
        ("BBB001", now_ms, 50.0, 20.0, 200.0, 10.0),
    ]
    latest = spark.createDataFrame(
        rows, schema="icao string, postime long, lat double, lng double, spd double, trak double"
    )
    assert _grid_spec(latest, 200.0, 3, 5) is None, "must fall back above 85°"
    hits = _assert_bucketed_equals_plain(spark, rows, 200.0)
    found = {(r["icao1"], r["icao2"]) for r in hits}
    # the over-the-pole antipodal pair is ~111 km apart and MUST be found
    assert ("AAA001", "AAA002") in found


def test_bucketed_flight_dist_high_lat_wide_envelope(spark):
    """s ≥ cos(φmax) regime: at lat 80° a ~2000 km envelope reaches
    over the pole — every longitude qualifies and the grid must refuse
    rather than prune by lon cell."""
    from storm_bench_spark.operators.flightdist import _grid_spec

    now_ms = 1_700_000_000_000
    rows = [
        ("CCC001", now_ms, 80.0, 0.0, 100.0, 0.0),
        ("CCC002", now_ms, 80.0, 180.0, 100.0, 180.0),  # over-pole: ~2224 km
        ("CCC003", now_ms, 79.0, 90.0, 100.0, 90.0),
    ]
    latest = spark.createDataFrame(
        rows, schema="icao string, postime long, lat double, lng double, spd double, trak double"
    )
    assert _grid_spec(latest, 2300.0, 3, 5) is None, (
        "envelope reaches over the pole: no lon cell count is lossless"
    )
    hits = _assert_bucketed_equals_plain(spark, rows, 2300.0)
    assert ("CCC001", "CCC002") in {(r["icao1"], r["icao2"]) for r in hits}


def test_bucketed_flight_dist_asin_sizing_at_midlat(spark):
    """Exact-asin lon sizing at moderate latitude with a large envelope
    (the regime where the old linear spelling under-sized Δλmax by the
    asin curvature): grid path taken, results equal all-pairs, and a
    pair straddling a wide longitude gap survives."""
    from storm_bench_spark.operators.flightdist import _grid_spec

    now_ms = 1_700_000_000_000
    rows = [
        ("DDD001", now_ms, 60.0, 0.0, 400.0, 90.0),
        ("DDD002", now_ms - 9_000_000, 60.0, 11.0, 400.0, 270.0),
        ("DDD003", now_ms, 60.1, 5.5, 400.0, 0.0),
        ("DDD004", now_ms - 5_000_000, -60.0, 100.0, 400.0, 180.0),
        ("DDD005", now_ms, 0.0, -120.0, 400.0, 0.0),
    ]
    latest = spark.createDataFrame(
        rows, schema="icao string, postime long, lat double, lng double, spd double, trak double"
    )
    # 9000 s postime spread at 400 kn ⇒ required ≈ 500 + 2·1852 km:
    # big enough that asin(s/cosφ) visibly exceeds s/cosφ
    spec = _grid_spec(latest, 500.0, 3, 5)
    assert spec is not None and spec[1] >= 1
    _assert_bucketed_equals_plain(spark, rows, 500.0)


def test_bucketed_flight_dist_prunes_cross_cluster_pairs(spark):
    """The grid join's candidate count must exclude far-apart pairs:
    2000 km between clusters vs a ~required_km of a few hundred km."""
    from pyspark.sql import functions as FF

    from storm_bench_spark.operators.flightdist import (
        _grid_spec,
        _precompute_with_cols,
    )

    latest = _synthetic_latest(spark)
    n = latest.count()
    all_pairs = n * (n - 1) // 2
    # reproduce the operator's candidate join and count it
    from storm_bench_spark.operators import flightdist as FD

    spec = _grid_spec(latest, 30.0, 3, 5)
    n_lat, n_lon = spec
    lat_cell = FF.least(
        FF.lit(n_lat - 1), FF.floor((FF.col("lat") + 90.0) / FF.lit(180.0 / n_lat))
    ).cast("int")
    lon_cell = (
        FF.floor((FF.col("lng") + 180.0) / FF.lit(360.0 / n_lon)).cast("int") % n_lon
    )
    cells = latest.withColumn("_clat", lat_cell).withColumn("_clon", lon_cell)
    a = _precompute_with_cols(
        cells, "1", [FF.col("_clat").alias("jlat"), FF.col("_clon").alias("jlon")]
    )
    neigh_lat = FF.array_distinct(
        FF.array(
            *[
                FF.greatest(FF.lit(0), FF.least(FF.lit(n_lat - 1), FF.col("_clat") + d))
                for d in (-1, 0, 1)
            ]
        )
    )
    neigh_lon = FF.array_distinct(
        FF.array(*[((FF.col("_clon") + d) % n_lon + n_lon) % n_lon for d in (-1, 0, 1)])
    )
    b = _precompute_with_cols(
        cells.withColumn("jlat", FF.explode(neigh_lat)).withColumn(
            "jlon", FF.explode(neigh_lon)
        ),
        "2",
        [FF.col("jlat"), FF.col("jlon")],
    )
    candidates = a.join(b, ["jlat", "jlon"]).where(FF.col("icao1") < FF.col("icao2"))
    assert candidates.count() < all_pairs, "grid must prune cross-cluster pairs"


def test_lsh_config_rule():
    from storm_bench_spark.operators.similarity import lsh_config_for

    assert lsh_config_for(500) == (32, 9)
    b16, r16 = lsh_config_for(60_000)
    assert r16 == 16 and b16 == 32
    b19, r19 = lsh_config_for(500_000)
    assert r19 == 19 and b19 == 128
    # clamps: tiny corpora never go below the 8x8 oracle config shape
    assert lsh_config_for(1)[1] == 8
    assert lsh_config_for(10**12)[1] == 24


def test_apply_changes_merge_semantics(spark):
    from pyspark.sql import functions as FF

    from storm_bench_spark.operators.cdc import apply_changes

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], schema="k long, name string"
    )
    # key 1: upserted twice (v2 wins); key 2: deleted; key 3: untouched;
    # key 4: inserted; key 5: delete of a nonexistent key (no-op)
    changes = spark.createDataFrame(
        [
            (1, 1, "upsert", "a1"),
            (1, 2, "upsert", "a2"),
            (2, 1, "delete", None),
            (4, 1, "upsert", "d"),
            (5, 1, "delete", None),
        ],
        schema="k long, v long, op string, name string",
    )
    out = apply_changes(
        base, changes, keys=["k"], order_key=FF.col("v"), payload_cols=["name"]
    )
    assert sorted(map(tuple, out.collect())) == [(1, "a2"), (3, "c"), (4, "d")]


# --- distributed prefix sum (operators/prefix.py) ------------------------

def test_prefix_sum_matches_brute_force(spark):
    from storm_bench_spark.operators.prefix import exclusive_prefix_sum

    # sparse, gapped, unordered ids — the block split must not assume
    # density; n_blocks=3 forces multiple blocks with uneven fill
    rows = [(900, 7), (3, 2), (50, 10), (51, 1), (877, 5), (4, 0), (600, 3)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(4)
    got = {
        r["id"]: r["ps"]
        for r in exclusive_prefix_sum(df, "id", "v", out_col="ps", n_blocks=3).collect()
    }
    acc, want = 0, {}
    for i, v in sorted(rows):
        want[i] = acc
        acc += v
    assert got == want


def test_prefix_sum_single_row_and_empty(spark):
    from storm_bench_spark.operators.prefix import exclusive_prefix_sum

    one = spark.createDataFrame([(5, 42)], "id long, v long")
    assert exclusive_prefix_sum(one, "id", "v", out_col="ps").collect()[0]["ps"] == 0
    empty = spark.createDataFrame([], "id long, v long")
    assert exclusive_prefix_sum(empty, "id", "v", out_col="ps").count() == 0


def test_pack_sequences_never_single_partition_window(spark):
    # the whole point of the distributed prefix sum: the corpus must
    # not funnel through Exchange SinglePartition for the running total
    from storm_bench_spark.plans.registry import all_queries

    plan = (
        all_queries()["pack_sequences"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan  # block offsets arrive by broadcast


def test_decontaminate_broadcasts_eval_grams(spark):
    from storm_bench_spark.plans.registry import all_queries

    plan = (
        all_queries()["decontaminate"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # train grams never shuffle for the probe


def test_apply_changes_struct_order_key_survives_large_ids(spark):
    # the old packed key sec*1e6 + change_id inverted the order once
    # change_id reached 1e6; the struct key is lexicographic at any
    # range: (sec=2, id=1) must beat (sec=1, id=1_000_001)
    from pyspark.sql import functions as FF

    from storm_bench_spark.operators.cdc import apply_changes

    base = spark.createDataFrame([(1, "old")], "k long, name string")
    ch = spark.createDataFrame(
        [(1, 1, 1_000_001, "stale", "upsert"), (1, 2, 1, "fresh", "upsert")],
        "k long, sec long, cid long, name string, op string",
    )
    out = apply_changes(
        base, ch, keys=["k"],
        order_key=FF.struct(FF.col("sec"), FF.col("cid")),
        payload_cols=["name"],
    ).collect()
    assert len(out) == 1 and out[0]["name"] == "fresh"


def test_ivf_fused_zero_norm_vector(spark):
    # ADVICE r10+r11 (similarity.py): a zero-norm corpus vector's
    # cosines are 0/0 = NaN in the Arrow kernel, but the pandas→Arrow
    # hand-off converts float NaN to NULL, so the fused path's score
    # array arrives JVM-side as all-NULLs and the zero vector sorts
    # LAST under the desc rank window (out of top-k). The COMPOSED
    # path's _pair_cos used to raise ANSI DIVIDE_BY_ZERO on the same
    # input; its nullif guard (round 12) makes it NULL-rank too. This
    # test pins BOTH spellings running green AND returning identical
    # rows on the zero-norm input class.
    from storm_bench_spark.operators import similarity as SIM

    rows = [
        (i, [float((i * 7 + d * 3) % 11 - 5) + 0.25 * d for d in range(4)])
        for i in range(20)
    ]
    rows[15] = (15, [0.0, 0.0, 0.0, 0.0])  # zero-norm, corpus-only id
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    fused = SIM.ann_topk_ivf_fused(
        vecs, n_queries=3, k=4, n_probe=2, n_centroids=5
    ).collect()
    assert len(fused) == 12  # 3 queries x k=4 — no row lost, no throw
    # the zero vector's NULL cosine never outranks a real candidate
    assert all(r["neighbor"] != 15 for r in fused)

    composed = SIM.ann_topk_ivf(
        vecs, vecs.where("vec_id < 3"), 4, n_probe=2, n_centroids=5
    ).collect()
    assert len(composed) == 12  # no throw (was DIVIDE_BY_ZERO pre-r12)

    def key(rs):
        return sorted(
            (r["qid"], r["rank"], r["neighbor"], r["cos"]) for r in rs
        )

    assert key(composed) == key(fused)


def test_semdedup_gram_tiling_bit_identical(spark, monkeypatch):
    """ADVICE r12: semdedup's cell kernel sub-blocks the Gram
    accumulation so a mega-cell degrades to more tiles instead of a
    dense k x k allocation. Tiling must not move a double: each Gram
    element accumulates m[a,i]*m[b,i] in the same i order regardless
    of which tile holds row a. Force the multi-tile path on
    fixture-sized cells (tile budget 64 elements -> bs of a few rows,
    many tiles per cell) and assert the pair set is bit-identical to
    the one-tile spelling; n_centroids=1 makes ONE cell so the tiling
    (not the clustering) is what the comparison exercises."""
    from storm_bench_spark.operators import similarity as SIM

    rows = [
        (i, [float((i * 13 + d * 5) % 17 - 8) / (1.0 + 0.1 * d) for d in range(8)])
        for i in range(60)
    ]
    rows[7] = (7, [0.0] * 8)  # zero-norm row: NaN cosines must drop
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    one_tile = sorted(
        tuple(r)
        for r in SIM.semdedup_pairs(vecs, 0.5, 8, n_centroids=1).collect()
    )
    assert one_tile, "fixture produced no pairs — threshold too high"
    monkeypatch.setattr(SIM, "SEMDEDUP_TILE_ELEMS", 64)
    tiled = sorted(
        tuple(r)
        for r in SIM.semdedup_pairs(vecs, 0.5, 8, n_centroids=1).collect()
    )
    assert tiled == one_tile
    assert all(7 not in (a, b) for a, b, _ in one_tile)
