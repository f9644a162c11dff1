"""connected_components semantics on hand-built graphs: the fixture's
near-dup clusters are near-cliques (diameter ~1), so these tests force
the shapes the fixtures can't — long paths (many propagation rounds),
multiple components, label-minimality."""

from storm_bench_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, schema="a long, b long")
    return {r["node"]: r["comp"] for r in connected_components(df).collect()}


def test_path_graph_propagates_to_min_label(spark):
    # 0-1-2-...-7: min label must walk the whole path (diameter 7 —
    # label propagation halves distance per round via both directions)
    out = _cc(spark, [(i, i + 1) for i in range(7)])
    assert out == {i: 0 for i in range(8)}


def test_multiple_components_and_unsorted_edges(spark):
    out = _cc(spark, [(5, 3), (3, 9), (20, 11), (40, 41)])
    assert out == {3: 3, 5: 3, 9: 3, 11: 11, 20: 11, 40: 40, 41: 40}


def test_cycle_terminates(spark):
    out = _cc(spark, [(1, 2), (2, 3), (3, 1)])
    assert out == {1: 1, 2: 1, 3: 1}


def test_long_path_converges_within_default_cap(spark):
    """VERDICT r3 #4: diameter 64 > max_iter 20 — plain propagation
    returned silently-wrong labels here; pointer jumping converges in
    O(log d) rounds and must produce the exact labeling."""
    out = _cc(spark, [(i, i + 1) for i in range(64)])
    assert out == {i: 0 for i in range(65)}


def test_unconverged_raises_instead_of_mislabeling(spark):
    import pytest

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(80)], schema="a long, b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)
