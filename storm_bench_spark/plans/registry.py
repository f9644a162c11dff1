"""Query registry: every engine capability is a named (DataFrame, oracle) pair.

The driver contract (``__spark_entry__.py``) needs ``queries()`` and
``oracle_sql()`` dicts; this registry is their single source of truth.
Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable plus
an optional DuckDB oracle SQL string with IDENTICAL output column names
(the driver sorts columns by name before hashing).

Queries with ``oracle=None`` are non-SQL-expressible (custom stateful
streaming etc.) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import side-effect modules once, on first registry access.
    import storm_bench_spark.plans.topologies  # noqa: F401
    import storm_bench_spark.plans.tpch  # noqa: F401
    import storm_bench_spark.plans.tpch_ext  # noqa: F401
    import storm_bench_spark.plans.pipeline  # noqa: F401
    import storm_bench_spark.plans.streaming_queries  # noqa: F401
    import storm_bench_spark.plans.dedup_queries  # noqa: F401
    import storm_bench_spark.plans.library_ops  # noqa: F401
    import storm_bench_spark.plans.relational  # noqa: F401
    import storm_bench_spark.plans.curation  # noqa: F401
    import storm_bench_spark.plans.training_prep  # noqa: F401
    import storm_bench_spark.plans.corpus_ops  # noqa: F401
    import storm_bench_spark.plans.sketch_queries  # noqa: F401
    import storm_bench_spark.plans.analytics_ext  # noqa: F401
    import storm_bench_spark.plans.lexicon_ops  # noqa: F401
    import storm_bench_spark.plans.scrub_ops  # noqa: F401
    import storm_bench_spark.plans.layout_ops  # noqa: F401


# Explicit gate order. The driver's correctness gate checks the FIRST 50
# registered queries only (verified: CORRECTNESS_r02 = registry positions
# 0-49 exactly), so position is signal. THE RULE (adopted round 4, per
# VERDICT r3 #8): any query whose code, shared helper, or oracle changed
# in the current round MUST sit in the first 50 positions — rotate
# long-stable rows out to make room and record the rotation in the
# commit message. Every registry name MUST be listed here
# (tests/test_registry.py asserts set equality, per VERDICT r5 #2); a
# name that somehow escapes the list sorts LAST — fail-safe: an
# unlisted query can never displace promised window rows.
#
# ROUND-14 WINDOW (exactly 50) = VERDICT r13 next #3 verbatim.
# Composition, from per-query max-round over all CORRECTNESS_r*.json
# files (r13 map: never=2, r10=31, r11=47, r12=49, r13=50):
# (a) the TWO never-driver-gated rows HEAD the window (the r13
# registry additions, pinned below the r13 window per the round-5
# rule): exact_dup_spans, multimodal_bmp_meta — after this gate,
# cumulative driver coverage is 179/179.
# (b) the FULL r10 cohort (31): every row whose last driver gate is
# r10 — the set-ops trio, the q8 source pair, rolling_latlong +
# both flight-dist rows, scd2/pii_mask/stratified_sample/
# text_normalize, the seven heavy TPC-H rows, user_event_pivot,
# multires_rollup, props_json_stats, salted_segment_revenue,
# user_moving_avg, value_zscore_outliers, interval_click_error,
# print_passthrough, unique_visitor_approx, streaming_audience_
# overlap, streaming_hll_visitors.
# (c) oldest r11 fillers (17, in standing cohort order): cdc_apply,
# user_event_unpivot, tpch_q17/q18/q20/q21/q22, bigram_lm_score,
# chunk_documents, contamination_score, domain_mix_sample,
# epoch_shuffle, events_cube, heavy_hitters_cms, lang_id,
# ngram_jaccard, quality_score.
# After this window the oldest gated row is r11 (30 remaining) — the
# r15 rotation takes the rest of the r11 cohort. No query code,
# shared helper, or oracle changed in round 14 (the round's diffs are
# bench-harness/protocol only), so the touched-row clause is vacuous.
# Registry FROZEN at 179 this round (VERDICT r13: "registry stays
# frozen at 179 unless an item below forces a change" — none did).
_GATE_PRIORITY: tuple[str, ...] = (
    "exact_dup_spans",
    "multimodal_bmp_meta",
    "streaming_audience_overlap",
    "unique_visitor_approx",
    "streaming_hll_visitors",
    "interval_click_error",
    "print_passthrough",
    "users_except",
    "users_intersect",
    "users_union",
    "multires_rollup",
    "props_json_stats",
    "rolling_latlong",
    "salted_segment_revenue",
    "scd2_customer_history",
    "source_centroids_q8",
    "source_similarity_q8",
    "user_moving_avg",
    "value_zscore_outliers",
    "rolling_flight_dist",
    "rolling_flight_dist_bucketed",
    "pii_mask",
    "stratified_sample",
    "text_normalize",
    "tpch_q2",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "user_event_pivot",
    "cdc_apply",
    "user_event_unpivot",
    "tpch_q17",
    "tpch_q18",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "bigram_lm_score",
    "chunk_documents",
    "contamination_score",
    "domain_mix_sample",
    "epoch_shuffle",
    "events_cube",
    "heavy_hitters_cms",
    "lang_id",
    "ngram_jaccard",
    "quality_score",
    # --- window boundary (first 50 above) ---
    "repetition_score",
    "simhash",
    "token_budget_select",
    "vocab_oov_rate",
    "chunk_dedup",
    "bm25_rank",
    "bpe_encode",
    "bpe_merge_steps",
    "containment_pairs",
    "corpus_curate",
    "corpus_split",
    "decontaminate",
    "decontaminate_minhash",
    "dedup_keep_best",
    "fuzzy_name_pairs",
    "fuzzy_name_pairs_d2",
    "fuzzy_triangles",
    "incremental_dedup",
    "inverted_index",
    "minhash_lsh",
    "neardup_clusters",
    "pagerank_neardup",
    "pii_scrub",
    "line_dedup",
    "simhash_pairs",
    "source_overlap",
    "table_profile",
    "textrank_keywords",
    "tfidf_top_terms",
    "training_corpus_build",
    "boilerplate_ngram_ratio",
    "embedding_neardup_lsh",
    "embedding_neardup_lsh_scaled",
    "ann_topk_ivf_kmeans",
    "pmi_bigrams",
    "pack_sequences",
    "quality_quantile_filter",
    "rrf_hybrid_rank",
    "dataclean",
    "dedup_exact",
    "distinct_users",
    "doc_fingerprint",
    "grep",
    "histogram_quantiles",
    "kmv_distinct_users",
    "lsh_recall_pairs",
    "multimodal_ppm_meta",
    "multimodal_wav_meta",
    "pageview_count",
    "rolling_count",
    "rolling_sort",
    "sol",
    "token_count",
    "top_terms",
    "tpch_q1",
    "tpch_q10",
    "tpch_q12",
    "tpch_q14",
    "tpch_q19",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "unique_visitor",
    "user_sessions",
    "wordcount",
    "ann_recall_at_k",
    "ann_topk",
    "asof_click_purchase",
    "bitmap_distinct_daily",
    "bitmap_distinct_weekly_rollup",
    "bitmap_retention_daily",
    "expand_words",
    "histogram_quantiles_rollup",
    "kmv_resemblance",
    "multimodal_audio_chunks",
    "multimodal_audio_meta",
    "multimodal_features",
    "multimodal_frames",
    "ann_rerank",
    "semdedup",
    "dup_ngram_spans",
    "multimodal_image_meta",
    "multimodal_resize",
    "one_per_key",
    "orders_rollup",
    "pageview_extract",
    "rolling_geo_count",
    "rolling_hashtag_count",
    "stateful_running_count",
    "streaming_bitmap_visitors",
    "streaming_cdc_apply",
    "streaming_dedup",
    "streaming_dedup_watermarked",
    "streaming_enriched_revenue",
    "streaming_flight_dist",
    "streaming_funnel",
    "streaming_hashtag_count",
    "streaming_heavy_hitters",
    "streaming_histogram_quantiles",
    "streaming_interval_join",
    "streaming_kmv_sketch",
    "streaming_rolling_count",
    "streaming_rolling_sort",
    "streaming_sol",
    "streaming_tumbling_ohlc",
    "streaming_user_sessions",
    "streaming_weighted_sample",
    "trident_wordcount",
    "tumbling_ohlc",
    "user_running_value",
    "value_percentiles",
    "weighted_sample",
    "weighted_sample_per_source",
    "zorder_layout",
    "adsb_parse",
    "ann_topk_ivf",
    "ann_topk_quantized",
    "asof_click_purchase_tol",
    "audience_overlap_hll",
    "bloom_high_value_orders",
    "cohort_retention",
    "dsir_select",
    "embedding_neardup",
    "embedding_project",
    "embedding_quantize",
    "funnel_conversion",
    "gap_fill_hourly",
    "hll_users_per_type",
)


def _gate_ordered() -> list[QuerySpec]:
    rank = {name: i for i, name in enumerate(_GATE_PRIORITY)}
    # unknown names sort LAST (fail-safe, changed round 6): a query
    # missing from _GATE_PRIORITY can never silently displace promised
    # gate-window rows. tests/test_registry.py additionally asserts the
    # list and the registry are set-equal, so this branch is dead in a
    # green tree; ties keep registration order (sort is stable).
    fallback = len(_GATE_PRIORITY)
    return sorted(_REGISTRY.values(), key=lambda s: rank.get(s.name, fallback))


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {spec.name: spec.fn for spec in _gate_ordered()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {spec.name: spec.oracle for spec in _gate_ordered() if spec.oracle is not None}


def get_spec(name: str) -> QuerySpec:
    _ensure_loaded()
    return _REGISTRY[name]
