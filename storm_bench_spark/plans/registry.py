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
# ROUND-12 WINDOW (exactly 50). Registry growth stays FROZEN at 177
# (VERDICT r11 next #8 — window math: 177 rows / 50 slots; unfreezing
# before the old cohorts re-gate would reopen the staleness gap;
# revisit at r13 when the oldest gated row is r9). Composition, from
# per-query max-round over all CORRECTNESS_r*.json files (note: the
# VERDICT r11 #2 "15 r7-gated rows" list was stale — most of it
# re-gated in r11; the true map is r7=4, r8=29, r9=46):
# (a) TOUCHED this round (5): boilerplate_ngram_ratio (in-array
# trigram-hash respell — the big exchange removed; bit-identical,
# BASELINE.md round 12) and the four registered queries whose plans
# contain _pair_cos, which now nullif-guards the norm product
# (zero-norm rows NULL-rank instead of ANSI DIVIDE_BY_ZERO):
# embedding_neardup_lsh, embedding_neardup_lsh_scaled, semdedup,
# ann_topk_ivf_kmeans. (The registered ann_topk_ivf runs the FUSED
# path — docstring-only change, keeps its r9 gate via the filler
# below; embedding_neardup and ann_recall_at_k use the Arrow
# reference scorer, untouched.)
# (b) the FULL r7 cohort (4): pmi_bigrams, pack_sequences,
# quality_quantile_filter, rrf_hybrid_rank — the rows deferred at
# positions 51-54 across the r11 window, promised to front this one.
# (c) the FULL r8 cohort (29): dataclean, dedup_exact, distinct_users,
# doc_fingerprint, grep, histogram_quantiles, kmv_distinct_users,
# lsh_recall_pairs, multimodal_ppm_meta, multimodal_wav_meta,
# pageview_count, rolling_count, rolling_sort, sol, token_count,
# top_terms, tpch_q1/q3/q4/q5/q6/q10/q12/q14/q19, unique_visitor,
# user_sessions, wordcount (embedding_neardup_lsh is r8 AND touched —
# counted once).
# (d) r9-cohort fillers (13, oldest-first alphabetical):
# ann_recall_at_k, ann_topk (the fused-path family neighbors of the
# touched code — cheap insurance), asof_click_purchase,
# bitmap_distinct_daily, bitmap_distinct_weekly_rollup,
# bitmap_retention_daily, expand_words, histogram_quantiles_rollup,
# kmv_resemblance, multimodal_audio_chunks, multimodal_audio_meta,
# multimodal_features, multimodal_frames.
# After this window the oldest gated row is r9 (33 remaining), then
# r10/r11 — the r13 rotation takes the rest of the r9 cohort.
_GATE_PRIORITY: tuple[str, ...] = (
    "boilerplate_ngram_ratio",
    "embedding_neardup_lsh",
    "embedding_neardup_lsh_scaled",
    "semdedup",
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
    # --- window boundary (first 50 above) ---
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
    "repetition_score",
    "simhash",
    "token_budget_select",
    "vocab_oov_rate",
    "chunk_dedup",
    "ann_rerank",
    "bm25_rank",
    "bpe_encode",
    "bpe_merge_steps",
    "containment_pairs",
    "corpus_curate",
    "corpus_split",
    "decontaminate",
    "decontaminate_minhash",
    "dedup_keep_best",
    "dup_ngram_spans",
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
    "audience_overlap_hll",
    "streaming_audience_overlap",
    "embedding_neardup",
    "ann_topk_ivf",
    "dsir_select",
    "unique_visitor_approx",
    "streaming_hll_visitors",
    "hll_users_per_type",
    "adsb_parse",
    "interval_click_error",
    "print_passthrough",
    "users_except",
    "users_intersect",
    "users_union",
    "ann_topk_quantized",
    "asof_click_purchase_tol",
    "bloom_high_value_orders",
    "cohort_retention",
    "embedding_quantize",
    "funnel_conversion",
    "gap_fill_hourly",
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
    "embedding_project",
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
    "weighted_sample",
    "streaming_weighted_sample",
    "weighted_sample_per_source",
    "streaming_bitmap_visitors",
    "tumbling_ohlc",
    "streaming_tumbling_ohlc",
    "zorder_layout",
    "rolling_geo_count",
    "streaming_kmv_sketch",
    "streaming_histogram_quantiles",
    "streaming_heavy_hitters",
    "streaming_dedup",
    "streaming_dedup_watermarked",
    "streaming_enriched_revenue",
    "streaming_rolling_count",
    "streaming_sol",
    "streaming_rolling_sort",
    "streaming_interval_join",
    "streaming_flight_dist",
    "streaming_user_sessions",
    "streaming_hashtag_count",
    "streaming_funnel",
    "streaming_cdc_apply",
    "trident_wordcount",
    "stateful_running_count",
    "rolling_hashtag_count",
    "orders_rollup",
    "user_running_value",
    "value_percentiles",
    "multimodal_image_meta",
    "multimodal_resize",
    "pageview_extract",
    "one_per_key",
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
