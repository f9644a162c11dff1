"""Plan lint: the scale discipline enforced as a test.

Every batch query's physical plan is checked for the shapes that kill
a 100 TB run regardless of how fast they are on fixtures:

- ``CartesianProduct`` — an unbroadcast cross join replicates both
  sides across the cluster; never acceptable.
- ``Exchange SinglePartition`` feeding a ``Window``, ``Sort``, or a
  non-pre-aggregated ``Aggregate`` — a global funnel pushes O(N) rows
  through one task (the reason operators/prefix.py exists). A final
  global aggregate whose exchange CHILD is a partial aggregate is
  benign (only one pre-aggregated row per upstream partition crosses
  the wire) and is not flagged; anything funneling raw rows must be
  in the top-k allowlist with a bounded-by-construction argument.
- ``BroadcastNestedLoopJoin`` — acceptable ONLY where the broadcast
  side is bounded by construction; every such query is allowlisted
  with its justification, so a new unjustified theta-join or
  un-pushed cross join fails this test the day it is introduced.

Streaming queries are skipped (their builders execute a stream; the
returned memory-table plan is a trivial scan, and their batch twins —
same operator code — are linted here).
"""

import contextlib
import io
import re

import pytest

from storm_bench_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

# BroadcastNestedLoopJoin allowlist: query -> why the broadcast side is
# bounded by construction (NOT data-dependent luck).
ALLOW_BNLJ = {
    # 1-row / threshold-row broadcast crossJoins (scalar fan-in)
    "quality_quantile_filter": "broadcast P25 threshold row",
    "domain_mix_sample": "broadcast per-source rate table (|sources| rows)",
    "bm25_rank": "broadcast corpus-stats row (N, avgdl)",
    "gap_fill_hourly": "broadcast global (h0, h1) bounds row",
    "top_terms": "broadcast doc-count row",
    "tpch_q11": "broadcast global value-threshold row",
    "tpch_q22": "broadcast avg-acctbal row",
    "token_budget_select": "broadcast one-row token-budget threshold",
    "tfidf_top_terms": "broadcast doc-count row (N for the idf)",
    "pmi_bigrams": "broadcast 1-row (n_bi, n_uni) corpus totals",
    # the __all__ sketch row joins the __all__ truth row on a
    # constant-folded key: two 1-row aggregates at any data size
    "kmv_distinct_users": "1-row __all__ sketch x 1-row truth aggregate",
    "histogram_quantiles": "broadcast 1-row global (mn, mx) bounds",
    "histogram_quantiles_rollup": "broadcast 1-row global (mn, mx) bounds",
    "kmv_resemblance": "theta self-join of the |types|-row distinct-type table (|types|^2 pairs by construction)",
    "audience_overlap_hll": "theta self-join of the |types|-row persisted register table (|types|^2 sketch pairs by construction)",
    "streaming_audience_overlap": "same |types|-row register theta self-join over the streaming snapshot",
    "streaming_histogram_quantiles": "broadcast 1-row static (mn, mx) bounds",
    "bloom_high_value_orders": "broadcast ~1 KB bitmap row",
    # bounded-side theta/cross joins
    "rolling_flight_dist": "A-row latest-state pair join, A = live aircraft",
    "embedding_neardup": "broadcast vector side of the documented O(N²) baseline (LSH variant is the scale path)",
    "ann_topk_ivf": "broadcast centroid table (C rows) + probe rows (queries × n_probe)",
    "ann_topk_ivf_kmeans": "same as ann_topk_ivf with k-means centroids",
    "ann_recall_at_k": "composes ann_topk + ann_topk_ivf (both allowlisted)",
    "rrf_hybrid_rank": "composes bm25_rank (allowlisted scalar-row crossJoins)",
}

# Round-robin-over-scan allowlist: queries whose plan may show an
# Exchange RoundRobinPartitioning directly over a raw scan. All of
# them go through plans/pipeline.py:_spread, which (since round 6)
# fires ONLY when the scan yields fewer splits than
# defaultParallelism — true for the fixture's single-row-group
# parquet (where the exchange parallelizes CPU-bound tokenization,
# measured -20% on the dedup queries at sf0.1), provably skipped on
# production multi-split input (test_spread_skips_* below). Any OTHER
# query showing this shape is an unconditional full-corpus shuffle
# and fails the lint.
ALLOW_SPREAD = {
    "lang_id", "quality_score", "repetition_score",
    "decontaminate", "pack_sequences", "quality_quantile_filter",
    "epoch_shuffle", "token_budget_select", "decontaminate_minhash",
    "contamination_score",
    "bigram_lm_score", "chunk_documents", "chunk_dedup",
    "inverted_index", "bm25_rank", "textrank_keywords",
    "heavy_hitters_cms", "domain_mix_sample",
    "minhash_lsh", "ngram_jaccard", "simhash", "simhash_pairs",
    "boilerplate_ngram_ratio", "vocab_oov_rate", "dsir_select",
    "bpe_merge_steps",
    "rrf_hybrid_rank",  # composes bm25_rank (a _spread user)
    "dup_ngram_spans", "line_dedup",  # corpus_ops._words (_spread user)
    "pii_scrub",  # direct _spread over the documents scan
    "bpe_encode",  # lexicon_ops._docs (_spread user)
    "tfidf_top_terms",  # direct _spread over the documents scan
    "source_overlap", "dedup_keep_best",  # compose minhash_lsh (a _spread user)
    "pmi_bigrams",  # direct _spread over the documents scan
    "containment_pairs",  # direct _spread over the documents scan
}

# Single-partition-funnel allowlist: query -> why the rows funneled
# through one task are bounded by construction (NOT data-dependent).
ALLOW_SINGLE_PARTITION = {
    # global cum-sum window over the distinct-value HISTOGRAM, not the
    # corpus: ≤ max-document-token-count rows (thousands) regardless of
    # corpus size. The old Window-only regex missed this shape (the
    # exchange's direct consumer is the window's Sort) — kept as the
    # documented example the tree-walk lint now sees.
    "quality_quantile_filter": "cum window over bounded (nt, freq) histogram",
    # fused-rank window over the full outer join of two ≤k-row ranked
    # lists (k = 20): ≤ 2k rows regardless of corpus size
    "rrf_hybrid_rank": "RRF window over ≤2k fused rank rows",
    # the __all__ sketch-merge re-rank runs over the per-type KEPT
    # rows only: ≤ |event types|·K_KMV (= 5·64) rows at any data size
    "kmv_distinct_users": "global rank over ≤ |types|·K merged sketch rows",
}

_SKIP_PREFIXES = ("streaming_", "trident_", "stateful_")

_BATCH_QUERIES = [
    n for n in all_queries() if not n.startswith(_SKIP_PREFIXES)
]


def _plan(spark, name):
    df = all_queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _tree_edges(plan_text: str):
    """Parse the formatted-explain tree diagram into (node_num ->
    {name, parent_num, child_nums}). The diagram is the indented block
    between '== Physical Plan ==' and the first blank line; each line
    ends with '(N)'. Parent = nearest preceding line with smaller
    indent — exact for the tree rendering Spark emits."""
    lines = plan_text.split("== Physical Plan ==", 1)[-1].splitlines()
    nodes: dict[int, dict] = {}
    stack: list[tuple[int, int]] = []  # (indent, num)
    for ln in lines:
        m = re.match(r"^([ :+\-*]*)([A-Za-z][\w .]*?)\s*\((\d+)\)\s*$", ln)
        if not m:
            if ln.strip() == "" and nodes:
                break  # end of diagram
            continue
        indent, name, num = len(m.group(1)), m.group(2).strip(), int(m.group(3))
        while stack and stack[-1][0] >= indent:
            stack.pop()
        parent = stack[-1][1] if stack else None
        nodes[num] = {"name": name, "parent": parent, "children": []}
        if parent is not None:
            nodes[parent]["children"].append(num)
        stack.append((indent, num))
    return nodes


# Transparent wrappers between an Exchange and its real consumer/child
# in the AQE-formatted tree.
_WRAPPERS = ("AQEShuffleRead", "ShuffleQueryStage", "InputAdapter",
             "WholeStageCodegen", "ReusedExchange", "Subquery")


def _real_parent(nodes, num):
    p = nodes[num]["parent"]
    while p is not None and nodes[p]["name"].startswith(_WRAPPERS):
        p = nodes[p]["parent"]
    return p


def _real_child(nodes, num):
    kids = nodes[num]["children"]
    while len(kids) == 1 and nodes[kids[0]]["name"].startswith(_WRAPPERS):
        kids = nodes[kids[0]]["children"]
    return kids[0] if len(kids) == 1 else None


def _detail_block(plan_text: str, num: int) -> str:
    m = re.search(rf"^\({num}\) [^\n]*\n((?:(?!^\(\d+\) ).*\n?)*)",
                  plan_text, re.M)
    return m.group(1) if m else ""


def _scan_under(nodes, plan_text, num):
    """Walk down from node `num` through transparent wrappers and
    ColumnarToRow to the single real child; return its node number if
    it is a raw scan, else None. Any real operator (Filter with
    non-pushed predicates, Project with expressions, Generate, ...)
    between the exchange and the scan breaks the 'directly over a raw
    scan' shape and ends the walk."""
    passthrough = _WRAPPERS + ("ColumnarToRow",)
    kids = nodes[num]["children"]
    while len(kids) == 1:
        k = kids[0]
        kname = nodes[k]["name"]
        if kname.startswith("Scan") or kname.startswith("BatchScan"):
            return k
        if not kname.startswith(passthrough):
            return None
        kids = nodes[k]["children"]
    return None


def _roundrobin_over_scan(plan_text: str) -> list[str]:
    """Return a violation string per Exchange RoundRobinPartitioning
    sitting directly over a raw scan — the shape _spread produces. At
    100 TB this moves the entire input across the network once, so it
    is only acceptable where _spread's conditional guard provably
    skips it on multi-split input (ALLOW_SPREAD)."""
    nodes = _tree_edges(plan_text)
    out = []
    for num, nd in nodes.items():
        if not nd["name"].startswith("Exchange"):
            continue
        if "RoundRobinPartitioning" not in _detail_block(plan_text, num):
            continue
        scan = _scan_under(nodes, plan_text, num)
        if scan is not None:
            out.append(
                f"Exchange RoundRobinPartitioning ({num}) over "
                f"{nodes[scan]['name']} ({scan})"
            )
    return out


def _single_partition_funnels(plan_text: str) -> list[str]:
    """Return a violation string per Exchange SinglePartition that
    funnels raw (non-pre-aggregated) rows into a Window, Sort, or
    Aggregate — the three global-funnel shapes."""
    nodes = _tree_edges(plan_text)
    out = []
    for num, nd in nodes.items():
        if not nd["name"].startswith("Exchange"):
            continue
        if "SinglePartition" not in _detail_block(plan_text, num):
            continue
        parent = _real_parent(nodes, num)
        consumer = nodes[parent]["name"] if parent is not None else "?"
        if not re.search(r"Window|Sort|Aggregate", consumer):
            continue
        child = _real_child(nodes, num)
        child_detail = _detail_block(plan_text, child) if child else ""
        # final global agg over map-side partials: one row per upstream
        # partition crosses the exchange — not a funnel
        if "Aggregate" in consumer and "partial_" in child_detail:
            continue
        out.append(f"Exchange SinglePartition ({num}) -> {consumer} ({parent})")
    return out


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_no_scale_killers_in_plan(name, spark):
    s = _plan(spark, name)
    # The tree walk below only parses the MAIN plan. No engine query
    # emits a scalar/IN-subquery section (every scalar fan-in is an
    # explicit broadcast crossJoin, so it lives in the main tree) —
    # keep it that way, or extend _tree_edges to walk each section.
    assert "Subquer" not in s, (
        f"{name}: plan contains a subquery section the funnel lint "
        f"does not scan — spell the scalar as an explicit broadcast "
        f"crossJoin, or extend _tree_edges to parse subquery sections"
    )
    assert "CartesianProduct" not in s, f"{name}: unbroadcast cross join"
    funnels = _single_partition_funnels(s)
    if funnels and name not in ALLOW_SINGLE_PARTITION:
        raise AssertionError(
            f"{name}: global single-partition funnel(s) {funnels} — "
            f"repartition on a key, use operators/prefix.py's blocked "
            f"scan, or allowlist with a bounded-rows justification"
        )
    if "BroadcastNestedLoopJoin" in s:
        assert name in ALLOW_BNLJ, (
            f"{name}: BroadcastNestedLoopJoin not allowlisted — either make "
            f"the join an equi-join / broadcast a bounded side, or add an "
            f"explicit justification to ALLOW_BNLJ"
        )
    rr = _roundrobin_over_scan(s)
    if rr and name not in ALLOW_SPREAD:
        raise AssertionError(
            f"{name}: round-robin exchange directly over a raw scan {rr} "
            f"— a full-input shuffle at scale. Route it through "
            f"plans/pipeline.py:_spread (whose guard skips it on "
            f"multi-split input) and add the query to ALLOW_SPREAD"
        )


def test_bnlj_allowlist_is_not_stale(spark):
    # Every allowlisted query must still exist; prune entries whose
    # plans no longer need the exemption (keeps the list honest).
    missing = set(ALLOW_BNLJ) - set(all_queries())
    assert not missing, f"allowlist references unknown queries: {missing}"
    missing_sp = set(ALLOW_SINGLE_PARTITION) - set(all_queries())
    assert not missing_sp, f"allowlist references unknown queries: {missing_sp}"
    missing_rr = ALLOW_SPREAD - set(all_queries())
    assert not missing_rr, f"allowlist references unknown queries: {missing_rr}"


# --- _spread conditional guard (plans/pipeline.py) -----------------------
# The ALLOW_SPREAD exemption above is only sound because _spread skips
# the exchange whenever the input is big enough to scan as
# >= defaultParallelism splits — i.e. on any production input. Since
# round 7 the split count is estimated from on-disk bytes ÷
# maxPartitionBytes (no `.rdd` planning probe — VERDICT r6 #3); these
# tests pin the estimate, both branches, and the overrides.

@pytest.fixture(scope="module")
def spread_dir(spark, tmp_path_factory):
    """A fake sf_dir holding a small documents.parquet (~tens of KB)."""
    d = tmp_path_factory.mktemp("spread_sf")
    spark.range(0, 5000, 1, numPartitions=1).selectExpr(
        "id AS doc_id", "repeat('x', 20) AS text"
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_spread_skips_when_input_scans_wide(spark, spread_dir, monkeypatch):
    from storm_bench_spark.plans.pipeline import _spread

    monkeypatch.delenv("SPARK_GRAFT_SPREAD", raising=False)
    # Shrink the split size so the small fixture file estimates as many
    # splits — the production-scale regime without a production file.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "100")
    try:
        df = spark.read.parquet(f"{spread_dir}/documents.parquet")
        assert _spread(df, spread_dir) is df  # identity — no exchange at all
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")


def test_spread_fires_on_small_input(spark, spread_dir, monkeypatch):
    from storm_bench_spark.plans.pipeline import _spread

    monkeypatch.delenv("SPARK_GRAFT_SPREAD", raising=False)
    par = spark.sparkContext.defaultParallelism
    # Default 128 MiB splits: the KB-sized file estimates 1 split.
    df = spark.read.parquet(f"{spread_dir}/documents.parquet")
    out = _spread(df, spread_dir)
    assert out is not df
    assert out.rdd.getNumPartitions() == par


def test_spread_mode_overrides(spark, spread_dir, monkeypatch):
    from storm_bench_spark.plans.pipeline import _spread

    df = spark.read.parquet(f"{spread_dir}/documents.parquet")
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "never")
    assert _spread(df, spread_dir) is df
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "always")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "100")
    try:
        out = _spread(df, spread_dir)  # wide estimate, but mode=always wins
        assert out is not df
        assert "RoundRobinPartitioning" in out._jdf.queryExecution().toString()
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")


def test_spread_rejects_unknown_mode(spark, spread_dir, monkeypatch):
    from storm_bench_spark.plans.pipeline import _spread

    df = spark.read.parquet(f"{spread_dir}/documents.parquet")
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "off")  # typo'd mode
    with pytest.raises(ValueError, match="SPARK_GRAFT_SPREAD"):
        _spread(df, spread_dir)


def test_conf_bytes_parses_suffixes(spark):
    from storm_bench_spark.plans.pipeline import _conf_bytes

    for raw, expect in [("134217728b", 128 << 20), ("128m", 128 << 20),
                        ("1g", 1 << 30), ("4096", 4096), ("16k", 16 << 10)]:
        spark.conf.set("spark.sql.files.maxPartitionBytes", raw)
        try:
            assert _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 0) == expect
        finally:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
