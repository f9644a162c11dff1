"""Plan lint: the scale discipline enforced as a test.

Every batch query's physical plan is checked for the shapes that kill
a 100 TB run regardless of how fast they are on fixtures:

- ``CartesianProduct`` — an unbroadcast cross join replicates both
  sides across the cluster; never acceptable.
- ``Exchange SinglePartition`` feeding a ``Window`` — a global ordered
  window funnels the whole table through one task (the reason
  operators/prefix.py exists); never acceptable.
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
    "bloom_high_value_orders": "broadcast ~1 KB bitmap row",
    # bounded-side theta/cross joins
    "rolling_flight_dist": "A-row latest-state pair join, A = live aircraft",
    "embedding_neardup": "broadcast vector side of the documented O(N²) baseline (LSH variant is the scale path)",
    "ann_topk_ivf": "broadcast centroid table (C rows) + probe rows (queries × n_probe)",
    "ann_topk_ivf_kmeans": "same as ann_topk_ivf with k-means centroids",
    "ann_recall_at_k": "composes ann_topk + ann_topk_ivf (both allowlisted)",
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


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_no_scale_killers_in_plan(name, spark):
    s = _plan(spark, name)
    assert "CartesianProduct" not in s, f"{name}: unbroadcast cross join"
    assert not re.search(r"Exchange SinglePartition[\s\S]{0,400}?Window", s), (
        f"{name}: global single-partition window"
    )
    if "BroadcastNestedLoopJoin" in s:
        assert name in ALLOW_BNLJ, (
            f"{name}: BroadcastNestedLoopJoin not allowlisted — either make "
            f"the join an equi-join / broadcast a bounded side, or add an "
            f"explicit justification to ALLOW_BNLJ"
        )


def test_bnlj_allowlist_is_not_stale(spark):
    # Every allowlisted query must still exist; prune entries whose
    # plans no longer need the exemption (keeps the list honest).
    missing = set(ALLOW_BNLJ) - set(all_queries())
    assert not missing, f"allowlist references unknown queries: {missing}"
