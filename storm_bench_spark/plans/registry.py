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
# ROUND-15 WINDOW (exactly 50) = VERDICT r14 next #1 (the touched-row
# correctness debt) + this round's optimization targets + oldest-cohort
# fillers:
# (a) ALL 27 round-14-touched rows FIRST — the rewritten dedup/CC/
# corpus/similarity/flight/span family had its code or a shared helper
# changed in commits 9320cdb..2c2dfad but was never re-certified by the
# driver's hash-gate at gate SF (VERDICT r14 "What's wrong" #1; the r14
# window predated the optimization work and was never re-rotated —
# a violation of this rule, acknowledged and repaid here). The set =
# VERDICT r14's audit list (25) + ann_topk_ivf_kmeans and
# source_similarity_q8, which this round's consumer audit shows also
# ride changed code (ann_topk_ivf helper; cb5be8c persist).
# rrf_hybrid_rank / embedding_project / token_budget_select were
# checked and EXCLUDED: they touch only unchanged *_sql() oracle
# generators or docstrings, not the changed Spark helpers.
# (b) the round-15 TOUCHED rows (final rotation, end of round 15):
# gap_fill_hourly, asof_click_purchase, asof_click_purchase_tol
# joined the window when the argmax-respell commit touched them; the
# three rolling_* twins initially pinned as optimization targets were
# examined, phase-profiled and left UNCHANGED (exec-bound, textbook
# two-phase plans — OPTIMIZATION_r15.md), so they rotated back out to
# make room. rolling_latlong / fuzzy_name_pairs_d2 / ann_rerank also
# ended the round untouched (adjudicated; rolling_latlong's decimal
# respell was measured slower and REVERTED) but keep their slots.
# NOTE on streams.py: round 15 added python_stateful_partitions() to
# streaming/streams.py — a pure function addition whose only
# behavioral consumer is streaming_funnel (gate-pinned above); no
# other streaming row's code path changed, so they are not rotated in.
# (c) fillers: the full r11-cohort remainder (16 rows, oldest gated
# cohort) + ann_recall_at_k (oldest r12 row). After this gate the
# oldest cohort is r12.
# Any FURTHER query touched later in round 15 must be rotated in
# before the round closes (the standing round-4 rule).
_GATE_PRIORITY: tuple[str, ...] = (
    "simhash",
    "simhash_pairs",
    "minhash_lsh",
    "lsh_recall_pairs",
    "source_overlap",
    "decontaminate_minhash",
    "incremental_dedup",
    "corpus_curate",
    "dedup_keep_best",
    "neardup_clusters",
    "pagerank_neardup",
    "training_corpus_build",
    "textrank_keywords",
    "pmi_bigrams",
    "bigram_lm_score",
    "source_similarity_q8",
    "funnel_conversion",
    "semdedup",
    "ann_topk_ivf",
    "ann_topk_ivf_kmeans",
    "dup_ngram_spans",
    "exact_dup_spans",
    "chunk_dedup",
    "rolling_flight_dist",
    "rolling_flight_dist_bucketed",
    "streaming_flight_dist",
    "streaming_funnel",
    "rolling_latlong",
    "fuzzy_name_pairs_d2",
    "ann_rerank",
    "gap_fill_hourly",
    "asof_click_purchase",
    "asof_click_purchase_tol",
    "bm25_rank",
    "bpe_encode",
    "bpe_merge_steps",
    "containment_pairs",
    "corpus_split",
    "decontaminate",
    "fuzzy_name_pairs",
    "fuzzy_triangles",
    "inverted_index",
    "line_dedup",
    "pii_scrub",
    "repetition_score",
    "table_profile",
    "tfidf_top_terms",
    "token_budget_select",
    "vocab_oov_rate",
    "ann_recall_at_k",
    # --- window boundary (first 50 above) ---
    "rolling_hashtag_count",
    "rolling_geo_count",
    "rolling_count",
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
    "salted_segment_revenue",
    "scd2_customer_history",
    "source_centroids_q8",
    "user_moving_avg",
    "value_zscore_outliers",
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
    "chunk_documents",
    "contamination_score",
    "domain_mix_sample",
    "epoch_shuffle",
    "events_cube",
    "heavy_hitters_cms",
    "lang_id",
    "ngram_jaccard",
    "quality_score",
    "boilerplate_ngram_ratio",
    "embedding_neardup_lsh",
    "embedding_neardup_lsh_scaled",
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
    "multimodal_ppm_meta",
    "multimodal_wav_meta",
    "pageview_count",
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
    "ann_topk",
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
    "multimodal_image_meta",
    "multimodal_resize",
    "one_per_key",
    "orders_rollup",
    "pageview_extract",
    "stateful_running_count",
    "streaming_bitmap_visitors",
    "streaming_cdc_apply",
    "streaming_dedup",
    "streaming_dedup_watermarked",
    "streaming_enriched_revenue",
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
    "ann_topk_quantized",
    "audience_overlap_hll",
    "bloom_high_value_orders",
    "cohort_retention",
    "dsir_select",
    "embedding_neardup",
    "embedding_project",
    "embedding_quantize",
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
