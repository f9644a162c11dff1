"""Physical-plan assertions: lock in the scale-critical plan shapes.

A query can be value-correct and still carry a plan that dies at
100 TB (lost pushdown, surprise shuffle, nested-loop instead of
broadcast). These tests pin the plan properties the design relies on,
so an innocent-looking refactor that breaks one fails CI, not the
cluster.
"""

from storm_bench_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

QS = all_queries()


def _plan(spark, name: str) -> str:
    return QS[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_tpch_q1_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "tpch_q1")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # column pruning: comment & shipping columns must not be read
    assert "l_comment" not in plan
    assert "l_shipmode" not in plan


def test_wordcount_uses_partial_aggregation(spark):
    plan = _plan(spark, "wordcount")
    # map-side combine before the exchange: partial then final count
    assert "partial_count" in plan
    assert plan.count("Exchange") == 1


def test_doc_fingerprint_has_no_shuffle(spark):
    # the fingerprint is a pure narrow map: scan → project, nothing else
    plan = _plan(spark, "doc_fingerprint")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_flight_dist_broadcasts_pair_side(spark):
    plan = _plan(spark, "rolling_flight_dist")
    assert "BroadcastExchange" in plan
    # global top-k must be TakeOrderedAndProject, not a full sort
    assert "TakeOrderedAndProject" in plan


def test_flight_dist_bucketed_joins_on_cells_not_pairs(spark):
    # grid-pruned candidate generation must be a hash join on the cell
    # key; the all-pairs theta join (BroadcastNestedLoopJoin) must be
    # gone — that's the no-broadcast-side-blowup property at large A
    plan = _plan(spark, "rolling_flight_dist_bucketed")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ann_topk_ivf_assigns_without_a_join(spark):
    # cell assignment is one ArrowEvalPython pass (centroids ride in
    # the kernel closure); the only joins are the tiny broadcast probe
    # join on cid — never a cartesian pair blowup over vectors
    plan = _plan(spark, "ann_topk_ivf")
    assert "ArrowEvalPython" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_tpch_q1_aggregates_in_two_exact_phases(spark):
    # phase 1 sums micro-unit longs per (group, input partition) — the
    # per-row path must stay in long arithmetic, with the wide-decimal
    # merge confined to the handful of partial rows
    plan = _plan(spark, "tpch_q1")
    assert "SPARK_PARTITION_ID" in plan.upper()
    # partials shuffle once, final groups shuffle once
    assert plan.count("Exchange") == 2


def test_ann_topk_scores_without_a_join(spark):
    # the query batch rides in the Arrow scorer's closure (driver-side
    # collect of a small set) — the big vector table must stream through
    # one ArrowEvalPython pass with NO join of any kind; the only
    # exchange allowed is the slim (qid, nid, cos) ranking shuffle
    plan = _plan(spark, "ann_topk")
    assert "ArrowEvalPython" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_lsh_band_kernel_runs_once_from_cache(spark):
    """Both LSH self-join sides must read the persisted per-vector key
    table (InMemoryTableScan), not re-derive the Arrow banding — the
    posexplode(udf) spelling re-ran the kernel 4x per query (a
    size()>0 pre-filter duplicates the UDF, and AQE broadcasts one
    side instead of reusing an exchange)."""
    plan = _plan(spark, "embedding_neardup_lsh")
    assert plan.count("InMemoryTableScan") >= 2
    # the only ArrowEvalPython nodes allowed are inside the (single)
    # cached relation's fill plan, which InMemoryTableScan displays;
    # none may appear outside a cache block on the join sides
    for line in plan.splitlines():
        if "ArrowEvalPython" in line:
            assert "InMemoryRelation" in plan


def test_dedup_candidates_are_equi_joins(spark):
    # LSH candidate generation must be hash-joinable (equi-join on the
    # band key), never a nested-loop cross join
    for name in ("minhash_lsh", "simhash_pairs", "embedding_neardup_lsh"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan, name


def test_unique_visitor_dedups_before_window_fanout(spark):
    # exact two-phase distinct: the per-bucket distinct aggregate must
    # sit BELOW the window Generate, so the fan-out consumes collapsed
    # (bucket, url, user) rows rather than W/S-replicated raw rows
    plan = _plan(spark, "unique_visitor")
    gen = plan.index("Generate explode")
    # the bottom-most aggregate (pre-distinct) appears after the
    # Generate in the top-down plan string
    assert plan.rindex("HashAggregate") > gen, "pre-distinct must feed the fan-out"
    # distinct-then-count keeps every exchange hash-partitioned; no raw
    # row survives to the window shuffle unaggregated
    assert "CartesianProduct" not in plan


def test_tpch_q6_pushes_every_predicate(spark):
    # the pushdown showcase: all four filters must reach the scan, and
    # the plan is scan → filter → partial agg → one-row exchange → final
    plan = _plan(spark, "tpch_q6")
    assert "PushedFilters:" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in plan or col in plan.split("PushedFilters:")[1][:400]
    assert "Join" not in plan


def test_asof_join_is_sort_not_join(spark):
    # the union-sort trick: NO join operator anywhere — keyed hash
    # exchanges (right-side pre-reduce on (user, sec) + the window's
    # user partition) and a window sort do the temporal matching
    plan = _plan(spark, "asof_click_purchase")
    assert "Join" not in plan
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Exchange rangepartitioning" not in plan  # never a global sort


def test_interval_join_is_hash_equi_join(spark):
    # bucket replication makes the range join an equi-join: hash join
    # on (user, bucket), never a nested-loop/cartesian range probe
    plan = _plan(spark, "interval_click_error")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_rollup_is_one_expand_pass(spark):
    # grouping sets expand rows once; no unioned re-scans
    plan = _plan(spark, "orders_rollup")
    assert plan.count("Expand") >= 1
    assert plan.count("FileScan") == 1


def test_corpus_curate_joins_stay_keyed(spark):
    plan = _plan(spark, "corpus_curate")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_two_phase_windows_aggregate_before_expanding(spark):
    # sliding_agg_twophase: the Generate (window fan-out) must sit ABOVE
    # the first aggregate, i.e. rows collapse before they replicate
    plan = _plan(spark, "rolling_count")
    gen = plan.index("Generate explode")
    # the partial aggregate of phase 1 appears below (later in the
    # bottom-up string) than the Generate
    first_agg = plan.rindex("partial_count")
    assert gen < first_agg, "window fan-out must consume aggregated buckets"


def test_tpch_ext_star_joins_broadcast_dims(spark):
    # q8's 8-way star: every dim side must arrive by broadcast — the
    # only allowed shuffles are fact⋈fact and the final tiny groupBy
    plan = _plan(spark, "tpch_q8")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastExchange") >= 5


def test_tpch_q2_min_cost_is_window_not_rescan(spark):
    # the correlated min-cost subquery must run as ONE window pass over
    # the eligible set, not a second scan+join of the cost table
    plan = _plan(spark, "tpch_q2")
    assert "Window" in plan
    assert plan.count("FileScan parquet") <= 6  # 5 tables + no rescan of lineitem


def test_tpch_q18_semi_join_broadcasts_having_set(spark):
    # the IN-over-HAVING orderkey set is aggregated (small) and must
    # broadcast into a LeftSemi hash join, never shuffle the fact side
    plan = _plan(spark, "tpch_q18")
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_tpch_q16_not_in_is_anti_join(spark):
    plan = _plan(spark, "tpch_q16")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q13_keeps_outer_join(spark):
    # zero-order customers must survive: the optimizer must not have
    # rewritten the LEFT OUTER into an inner join despite the count agg
    plan = _plan(spark, "tpch_q13")
    assert "LeftOuter" in plan


def test_tpch_q21_aggregates_sibling_scan_once(spark):
    # the EXISTS/NOT-EXISTS pair must collapse into per-order stats:
    # lineitem appears at most twice (late lines + stats), never the
    # spec's 3 correlated scans
    plan = _plan(spark, "tpch_q21")
    assert plan.count("FileScan parquet lineitem") <= 2
    assert "CartesianProduct" not in plan


def test_chunk_documents_has_no_shuffle(spark):
    # chunking is a narrow map: scan → tokenize → explode → slice; a
    # shuffle here would mean the 100 TB chunk pass pays an exchange
    # for nothing
    plan = _plan(spark, "chunk_documents")
    assert "Exchange" not in plan.replace("Exchange RoundRobinPartitioning", "")
    assert "Join" not in plan


def test_embedding_quantize_has_no_shuffle_or_join(spark):
    plan = _plan(spark, "embedding_quantize")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_chunk_dedup_shuffles_digests_not_text(spark):
    # ownership agg + survivor join key on the block md5; the final
    # reassembly is the only aggregation that carries block text
    plan = _plan(spark, "chunk_dedup")
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bigram_lm_counts_are_partial_aggregated(spark):
    # corpus → bigram counts must combine map-side (the shuffle carries
    # one row per distinct bigram, not one per corpus token)
    plan = _plan(spark, "bigram_lm_score")
    assert "partial_count" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bm25_top_k_is_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "bm25_rank")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_textrank_reuses_cached_edge_table(spark):
    # the 5 iterations must read the persisted edge+degree table, not
    # re-derive the corpus-sized bigram pipeline per iteration
    plan = _plan(spark, "textrank_keywords")
    assert plan.count("InMemoryTableScan") >= 5
    # and the corpus scan appears only under the cached subtree build
    assert "CartesianProduct" not in plan
