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
# ROUND-11 WINDOW (exactly 50) = VERDICT r10 next #3 verbatim, plus
# the round's touched rows. Registry growth is FROZEN at 177 this
# round (VERDICT r10 next #8 — the explicit window-math statement;
# rationale in COVERAGE.md), so every slot goes to staleness
# retirement or touched-row re-gating:
# (a) the FULL r5 cohort (7: cdc_apply, user_event_unpivot,
# tpch_q17/q18/q20/q21/q22 — the rows displaced across r10's window,
# promised to front this rotation) and the FULL r6 cohort (14:
# bigram_lm_score, chunk_documents, contamination_score,
# domain_mix_sample, epoch_shuffle, events_cube, heavy_hitters_cms,
# lang_id, ngram_jaccard, quality_score, repetition_score, simhash,
# token_budget_select, vocab_oov_rate).
# (b) TOUCHED this round: chunk_dedup (respelled so corpus text never
# crosses an exchange, then window-min ownership — one digest shuffle;
# bit-identical vs its unchanged oracle at sf0.1 at each swap),
# line_dedup (strip_common_segments' distinct-doc count moved into a
# dense-rank digest window — 1.35 s -> 0.72 s at the sf1 tier,
# bit-identical), plus ann_rerank and embedding_neardup_lsh_scaled
# (the last two >2x perf rows — profiled and floor-adjudicated in
# BASELINE.md; in-window so the re-gate covers whatever the
# adjudication touched).
# (c) r7-cohort staleness fillers (25 of 29 remaining): bm25_rank,
# bpe_encode, bpe_merge_steps, containment_pairs, corpus_curate,
# corpus_split, decontaminate, decontaminate_minhash, dedup_keep_best,
# dup_ngram_spans, fuzzy_name_pairs, fuzzy_name_pairs_d2 (its R=100
# boundedness determination is BASELINE.md round 11 — no code
# change), fuzzy_triangles, incremental_dedup, inverted_index,
# minhash_lsh, neardup_clusters, pagerank_neardup, pii_scrub,
# simhash_pairs, source_overlap, table_profile, textrank_keywords,
# tfidf_top_terms, training_corpus_build.
# The 4 deferred r7 rows (pmi_bigrams — displaced when line_dedup's
# respell forced it into the window — plus pack_sequences,
# quality_quantile_filter, rrf_hybrid_rank; all untouched since r7,
# lightweight pure-plan rows) sit at positions 51-54 and front the
# r12 rotation; after this window no registry row's latest driver
# gate is older than r7.
# Docstring-only touches this round (ann_topk_ivf zero-norm semantics
# note, wide-HLL layout caveat) change no behavior and keep their r10
# gates.
_GATE_PRIORITY: tuple[str, ...] = (
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
    "embedding_neardup_lsh_scaled",
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
    # --- window boundary (first 50 above) ---
    "pmi_bigrams",
    "pack_sequences",
    "quality_quantile_filter",
    "rrf_hybrid_rank",
    "audience_overlap_hll",
    "streaming_audience_overlap",
    "embedding_neardup",
    "ann_topk_ivf",
    "dsir_select",
    "boilerplate_ngram_ratio",
    "unique_visitor_approx",
    "streaming_hll_visitors",
    "hll_users_per_type",
    "adsb_parse",
    "interval_click_error",
    "print_passthrough",
    "users_except",
    "users_intersect",
    "users_union",
    "ann_topk_ivf_kmeans",
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
    "semdedup",
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
    "kmv_resemblance",
    "ann_recall_at_k",
    "weighted_sample",
    "streaming_weighted_sample",
    "weighted_sample_per_source",
    "bitmap_distinct_daily",
    "streaming_bitmap_visitors",
    "bitmap_retention_daily",
    "bitmap_distinct_weekly_rollup",
    "histogram_quantiles_rollup",
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
    "asof_click_purchase",
    "multimodal_features",
    "multimodal_audio_meta",
    "multimodal_audio_chunks",
    "ann_topk",
    "multimodal_image_meta",
    "multimodal_resize",
    "multimodal_frames",
    "pageview_extract",
    "expand_words",
    "one_per_key",
    "multimodal_wav_meta",
    "multimodal_ppm_meta",
    "histogram_quantiles",
    "lsh_recall_pairs",
    "kmv_distinct_users",
    "embedding_neardup_lsh",
    "wordcount",
    "grep",
    "rolling_count",
    "rolling_sort",
    "sol",
    "pageview_count",
    "dataclean",
    "distinct_users",
    "unique_visitor",
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q6",
    "tpch_q14",
    "tpch_q19",
    "tpch_q10",
    "tpch_q12",
    "tpch_q5",
    "dedup_exact",
    "doc_fingerprint",
    "token_count",
    "top_terms",
    "user_sessions",
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
