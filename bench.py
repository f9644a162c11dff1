#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is fully materialized through the noop sink (no driver
collect, no column pruning shortcut — the executed plan is the plan a
real sink would see).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from pyspark.sql import functions as F

from storm_bench_spark.plans.registry import all_queries
from storm_bench_spark.session import get_spark

HEADLINE = [
    # the 12 reference topologies (SURVEY.md §2.10)
    "wordcount",
    "grep",
    "rolling_count",
    "rolling_hashtag_count",
    "rolling_geo_count",
    "rolling_sort",
    "sol",
    "pageview_count",
    "dataclean",
    "unique_visitor",
    "rolling_latlong",
    "rolling_flight_dist",
    "rolling_flight_dist_bucketed",
    # SQL capability demos — the full TPC-H 22 (q2..q22 adapted to the
    # fixture schema where it lacks partsupp/comment/phone columns; see
    # plans/tpch_ext.py docstring)
    "tpch_q1",
    "tpch_q2",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    # temporal joins + set ops + ranking + analytics
    "asof_click_purchase",
    "interval_click_error",
    "users_intersect",
    "top_terms",
    "orders_rollup",
    "user_running_value",
    "value_percentiles",
    "user_sessions",
    # curation pipeline (iterative CC + composed keep-canonical +
    # near-dup graph centrality, round 7)
    "neardup_clusters",
    "corpus_curate",
    "pagerank_neardup",
    # span-duplication measure + boilerplate-line scrub + PII
    # redaction (round 7)
    "dup_ngram_spans",
    "line_dedup",
    "pii_scrub",
    # tokenizer apply (train on vocab, join-encode the corpus, round 7)
    "bpe_encode",
    # incremental admission, split census, table profile, TF-IDF
    # keywords, source overlap, keep-best survivorship (late round 7)
    "incremental_dedup",
    "corpus_split",
    "table_profile",
    "tfidf_top_terms",
    "source_overlap",
    "dedup_keep_best",
    "pmi_bigrams",
    "containment_pairs",
    "kmv_distinct_users",
    # training-data pipeline: text analysis & cleaning
    "dedup_exact",
    "doc_fingerprint",
    "token_count",
    "quality_score",
    "lang_id",
    "text_normalize",
    "pii_mask",
    "repetition_score",
    "stratified_sample",
    "decontaminate",
    "pack_sequences",
    "quality_quantile_filter",
    # training-data pipeline: corpus/IR ops (round 4)
    "bigram_lm_score",
    "chunk_documents",
    "chunk_dedup",
    "domain_mix_sample",
    "inverted_index",
    "bm25_rank",
    "textrank_keywords",
    "heavy_hitters_cms",
    # training-data pipeline: dedup / similarity / multimodal
    "minhash_lsh",
    "ngram_jaccard",
    "simhash_pairs",
    "embedding_neardup_lsh",
    "semdedup",
    "ann_topk",
    "ann_topk_ivf",
    "ann_topk_quantized",
    "embedding_quantize",
    "multimodal_image_meta",
    # real RIFF/WAVE + Netpbm P6 codec round-trips (round 8)
    "multimodal_wav_meta",
    "multimodal_ppm_meta",
    "adsb_parse",
    # sketches / pruning / fuzzy blocking (round 4, late)
    "hll_users_per_type",
    "bloom_high_value_orders",
    # 5th sketch family: rank/quantile via mergeable histogram, and
    # KMV set-resemblance from sketches alone (round 8)
    "histogram_quantiles",
    "histogram_quantiles_rollup",
    "kmv_resemblance",
    "fuzzy_name_pairs",
    "salted_segment_revenue",
    # time-series / history / funnel analytics (round 4, late)
    "gap_fill_hourly",
    "scd2_customer_history",
    "funnel_conversion",
    "value_zscore_outliers",
    "streaming_hll_visitors",
    "user_moving_avg",
    "embedding_project",
    "fuzzy_triangles",
    "multires_rollup",
    "unique_visitor_approx",
    "ann_recall_at_k",
    "training_corpus_build",
    "fuzzy_name_pairs_d2",
    "streaming_cdc_apply",
    "cohort_retention",
    "source_centroids_q8",
    "source_similarity_q8",
    "streaming_funnel",
    "user_event_pivot",
    "streaming_enriched_revenue",
    "asof_click_purchase_tol",
    "user_event_unpivot",
    "props_json_stats",
    # round 5: shuffle / budget-select / fuzzy decontamination
    "epoch_shuffle",
    "token_budget_select",
    "decontaminate_minhash",
    # round 5, late: hybrid retrieval + graded contamination + CMS twin
    "rrf_hybrid_rank",
    "contamination_score",
    # round 9: exact-n weighted sampling (A-ES via max-of-w-uniforms),
    # global and stratified-per-source (WindowGroupLimit grouped top-n)
    "weighted_sample",
    "weighted_sample_per_source",
    # round 9, late: bitmap-index exact distinct (batch + streaming
    # fixed-size-state twin), single-agg OHLC bars, Z-order layout audit
    "bitmap_distinct_daily",
    "streaming_bitmap_visitors",
    "bitmap_retention_daily",
    "bitmap_distinct_weekly_rollup",
    "tumbling_ohlc",
    "streaming_tumbling_ohlc",
    "zorder_layout",
    "streaming_heavy_hitters",
    "lsh_recall_pairs",
    "events_cube",
    # round 5, tail: tokenizer prep + DSIR data selection + 2-stage ANN
    "boilerplate_ngram_ratio",
    "vocab_oov_rate",
    "dsir_select",
    "bpe_merge_steps",
    "ann_rerank",
]


# Paired-ratio honesty gate (VERDICT r8 next #1): the ratio is only
# printed when the box measured the SAME between the two legs. The
# probe is a fixed CPU-bound DuckDB aggregation (no Spark, no IO after
# first touch) timed min-of-3 immediately before each leg; a relative
# shift beyond PROBE_DRIFT_MAX means box state moved mid-pair (other
# tenants, thermal, page-cache pressure) and the aggregate ratio would
# be attributing box drift to code — suppress it, keep both totals.
PROBE_DRIFT_MAX = 0.25


def box_probe(runs: int = 3) -> float:
    import duckdb

    con = duckdb.connect()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(
            "SELECT sum(x * x) FROM "
            "(SELECT CAST(range AS DOUBLE) AS x FROM range(400000000))"
        ).fetchall()
        best = min(best, time.perf_counter() - t0)
    con.close()
    return round(best, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="sbs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    # JVM/codegen/scan warmup so the first timed query isn't charged
    # one-time startup: exercise codegen, a shuffle, and the file index
    # of every fixture table (cheap count over pruned scans).
    spark.range(100_000).selectExpr("sum(id * 2)").collect()
    spark.range(10_000).selectExpr("id % 7 AS k").groupBy("k").count().collect()
    from storm_bench_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).select(F.lit(1)).limit(1).collect()

    # box-state gauge at Spark-leg start (pair drift detection below)
    probe_spark = box_probe()

    # min-of-N per query, mirroring the DuckDB baseline's min-of-N:
    # single-run timings flap ±1 s on untouched code (JIT, GC, page
    # cache), which made round-over-round deltas unattributable.
    # Round 9 (VERDICT r8 next #1): N defaults to 3 and the max−min
    # SPREAD is recorded per query, so every reported number carries
    # its own dispersion — two same-day r8 pairs disagreed 0.86× vs
    # 1.08× on an identical tree, making unstated variance the largest
    # error bar on any perf claim.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    from storm_bench_spark.streaming.streams import LAST_STREAM_RUNS

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    stream_floor: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        samples: list[float] = []
        floor = 0.0
        for _ in range(runs):
            before = list(LAST_STREAM_RUNS)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            # engine-start/checkpoint floor of the run's streams
            # (VERDICT r8 next #4); roughly constant across runs, so
            # the last run's value stands for the row
            floor = sum(
                r.get("floor_sec") or 0.0
                for r in LAST_STREAM_RUNS
                if not any(r is b for b in before)
            )
        # Release every DataFrame.persist the query planted (fuzzy
        # variant tables, shingle arrays, prefix-sum blocks, ...): the
        # operators are lazy so they cannot unpersist their own
        # intermediates, and across 100+ queries the cached blocks
        # otherwise accumulate in executor storage. Between QUERIES,
        # not runs — the r1–r8 protocol (min-of-N over same-cache
        # reruns); changing it would break round-over-round deltas.
        spark.catalog.clearCache()
        timings[name] = round(min(samples), 3)
        # dispersion over the WARM encounters only: run 1 pays JIT /
        # first-plan compilation for this row's code paths, which is
        # warm-up, not box noise — including it made value_spread ~50%
        # of the total and the ± band meaninglessly wide
        warm = samples[1:] if len(samples) > 2 else samples
        spreads[name] = round(max(warm) - min(warm), 3)
        if floor > 0:
            stream_floor[name] = round(floor, 3)
        print(
            f"# {name}: {timings[name]}s (min of {runs}, "
            f"spread {spreads[name]}s)",
            file=sys.stderr,
        )

    # box-state gauge at Spark-leg END too (added after the 2026-08-15
    # evening pairs: churn that ARRIVES mid-leg passes a start-only
    # gate — pair 20:47 printed 1.226× with drift 0.126 because the
    # probe ran before the other tenant did; four probes make the gate
    # see within-leg drift)
    probe_spark_end = box_probe()

    total = round(sum(timings.values()), 3)
    # Full per-query detail goes to a FILE; stdout ends with a compact
    # line that fits the driver's 2 KB stdout-tail capture (at 103
    # queries the full dict is >2 KB, which made BENCH_r04 parse as
    # null — the driver recorded rc=0 but no numbers). The compact
    # line carries totals + the 5 slowest rows so round-over-round
    # regression diffing works from the driver record alone;
    # BENCH_DETAIL.json has everything.
    # Same-hour DuckDB twin, SAME process, shared pair_id (VERDICT r7
    # next #4): box state drifts between separately-launched runs (a
    # reboot mid-round-7 moved Spark times ~36% while DuckDB sat
    # still), so a ratio is only honest when both legs ran together.
    # Opt out with SPARK_GRAFT_DUCK=0 (e.g. Spark-only profiling).
    #
    # Robustness to an external wall-clock cap: the Spark-leg results
    # are written and a COMPLETE stdout line printed BEFORE the duck
    # leg starts, then the final line (with duck_total/ratio) prints
    # after it. The driver captures the stdout TAIL, so if this
    # process is killed mid-duck the last intact line still carries
    # the full Spark record — the pairing degrades gracefully instead
    # of losing the round's bench numbers.
    pair_id = time.strftime("%Y-%m-%dT%H:%M:%S")
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    worst = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    total_spread = round(sum(spreads.values()), 3)
    total_floor = round(sum(stream_floor.values()), 3)

    def _emit(duck_total=None, duck_spread=None, probes=None):
        with open(detail_path, "w") as f:
            json.dump({
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spreads": spreads,
                "value_spread": total_spread,
                "stream_floor_sec": stream_floor,
                "stream_floor_total": total_floor,
                "sf": sf,
                "runs": runs,
                "pair_id": pair_id,
                "duck_total": duck_total,
                "probes": probes,
            }, f, indent=1, sort_keys=True)
        out = {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "n_queries": len(timings),
            "value_spread": total_spread,
            "stream_floor_total": total_floor,
            "queries": worst,
            "detail": "BENCH_DETAIL.json",
        }
        if duck_total:
            out["duck_total"] = duck_total
            out["pair_id"] = pair_id
            ratio = round(total / duck_total, 3)
            # ± on the ratio: conservative linear propagation of both
            # legs' summed per-query spreads
            pm = round(
                ratio * (total_spread / total + (duck_spread or 0) / duck_total),
                3,
            )
            drift = None
            if probes and probes.get("spark_leg") and probes.get("duck_leg"):
                # max pairwise drift over EVERY probe taken (leg
                # starts AND ends): the gate must see churn that
                # arrives mid-leg, not only churn present at starts
                vals = [v for v in probes.values() if v]
                drift = round((max(vals) - min(vals)) / min(vals), 3)
            if drift is not None and drift > PROBE_DRIFT_MAX:
                # box state moved mid-pair: a ratio would attribute the
                # drift to code — refuse it, keep the raw totals
                out["ratio_vs_duck"] = None
                out["ratio_suppressed_box_drift"] = drift
            else:
                out["ratio_vs_duck"] = ratio
                out["ratio_pm"] = pm
                if drift is not None:
                    out["probe_drift"] = drift
            # processing-time ratio for the streaming-row floor
            # (VERDICT r8 next #4): the fixed engine-start cost is real
            # wall but not plan quality — report both
            if total_floor:
                out["ratio_vs_duck_processing"] = round(
                    (total - total_floor) / duck_total, 3
                )
        print(json.dumps(out), flush=True)

    probes = {
        "spark_leg": probe_spark,
        "spark_leg_end": probe_spark_end,
        "duck_leg": None,
        "duck_leg_end": None,
    }
    _emit(probes=probes)
    if os.environ.get("SPARK_GRAFT_DUCK", "1") != "0":
        spark.stop()  # free the JVM's memory before DuckDB materializes
        from scripts.duck_twin import time_oracles, write_detail

        probes["duck_leg"] = box_probe()
        duck_timings, duck_spreads = time_oracles(sf_dir, HEADLINE, runs)
        probes["duck_leg_end"] = box_probe()
        write_detail(duck_timings, sf, runs, pair_id=pair_id,
                     spreads=duck_spreads, probe=probes["duck_leg"])
        _emit(round(sum(duck_timings.values()), 3),
              round(sum(duck_spreads.values()), 3), probes)


if __name__ == "__main__":
    main()
