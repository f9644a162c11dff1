"""Iterative graph operators: connected components for dedup clusters.

Near-dup PAIRS (minhash_lsh, simhash_pairs, …) are only half of a
dedup pipeline — keeping one canonical document per duplicate CLUSTER
requires grouping the pairs into components. Min-label propagation is
the Spark-native formulation (the same loop GraphX/GraphFrames runs):
every node repeatedly adopts the smallest label among itself and its
neighbors; at fixpoint each component is labeled by its smallest
member, which doubles as the canonical representative.

Scale discipline:
- each iteration is ONE key-partitioned join + groupBy(min) — no
  driver-side graph, shuffles only on node ids;
- ``localCheckpoint`` truncates lineage per iteration: without it the
  plan doubles every round (Catalyst re-analyzes a 2^k-deep tree) and
  executors re-run the whole history on any retry;
- each round ends with a pointer-jump (every node adopts its label's
  label), so label distance roughly halves per round and convergence
  is O(log diameter) — a path-shaped chain of transitive near-dups
  (the adversarial case for plain propagation) converges in ~log₂(d)
  rounds instead of d;
- convergence is a driver-side count of changed labels (one scalar),
  with an iteration cap as the runaway guard. Hitting the cap while
  labels are still moving RAISES — an unconverged labeling silently
  picks wrong canonical docs downstream, which is strictly worse than
  failing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame, a: str, b: str) -> DataFrame:
    """(node, peer) with every edge in both orientations — ONE pass.

    Round 14: was ``select(a,b).union(select(b,a))``, whose two
    branches are separate subtrees, so the whole upstream pair
    pipeline (for the near-dup graphs: candidate join + exact-Jaccard
    verify) evaluated TWICE before the eager checkpoint that follows.
    Exploding a two-struct array emits both orientations from a single
    evaluation of each edge row — same multiset (union is UNION ALL),
    half the upstream work, and one scan stage instead of two."""
    return edges.select(
        F.explode(
            F.array(
                F.struct(F.col(a).alias("node"), F.col(b).alias("peer")),
                F.struct(F.col(b).alias("node"), F.col(a).alias("peer")),
            )
        ).alias("e")
    ).select("e.node", "e.peer")


def connected_components(
    edges: DataFrame, max_iter: int = 30, a: str = "a", b: str = "b"
) -> DataFrame:
    """(node, comp) for every node appearing in ``edges`` (undirected
    pairs); ``comp`` is the smallest node id in the component.

    Deterministic for any edge ordering — min is commutative and the
    pointer-jump only shortcuts along already-derived labels — so a
    DuckDB recursive-CTE reachability oracle replays the fixpoint
    exactly. Raises ``RuntimeError`` if labels are still changing at
    ``max_iter``. Since round 14 the jump reads the PREVIOUS
    iteration's labels, so per-round reach grows Fibonacci-like
    (~1.618^t), not ~2^t: convergence needs diameter ≲ 1.618^max_iter.
    The default is 30 (≈ 1.9M effective diameter — more than the old
    20-round doubling bound covered), so graphs that converged before
    the round-14 respell still converge; a non-converging input fails
    loudly rather than silently mislabeling.
    """
    sym = _symmetrize(edges, a, b).localCheckpoint(eager=True)

    # Convergence gauge: labels are monotone non-increasing per node
    # and the node set is fixed, so Σcomp is strictly decreasing until
    # the fixpoint and equal across an iteration IFF no label moved.
    # Comparing sums replaces the per-iteration join+count action of
    # rounds ≤13 with one tiny aggregate over the already-materialized
    # checkpoint — at bench SF the loop cost is job count, not bytes.
    # DECIMAL(38,0) accumulation: a bigint sum overflows once
    # n_nodes × max_id exceeds 2^63 (10^10 docs with 2^40 ids does),
    # and a silent wrap could fake sum-equality mid-descent.
    def _label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).first()[0]

    # Init = the old round 1's propagation, folded into ONE keyed
    # aggregate: label(v) = min(v, min neighbor) — replaces the
    # distinct-nodes checkpoint AND the first iteration's join.
    labels = (
        sym.groupBy("node")
        .agg(F.least(F.col("node"), F.min("peer")).alias("comp"))
        .localCheckpoint(eager=True)
    )
    prev_sum = _label_sum(labels)

    converged = False
    for _ in range(max_iter):
        neigh_min = (
            sym.join(
                labels.select(F.col("node").alias("peer"), F.col("comp").alias("pcomp")),
                "peer",
            )
            .groupBy("node")
            .agg(F.min("pcomp").alias("nmin"))
        )
        prop = labels.join(neigh_min, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce("nmin", F.col("comp"))).alias("comp"),
        )
        # Pointer jumping (path shortcutting): adopt the label OF the
        # label — looked up in the PREVIOUS iteration's labels, which
        # are already materialized. Rounds ≤13 jumped through `prop`
        # itself, which required an extra eager checkpoint of prop per
        # iteration (both jump-join sides embedded it); jumping through
        # the old labels needs no mid-iteration materialization, so an
        # iteration is ONE checkpoint job + one scalar aggregate.
        # Still monotone toward the same unique min-label fixpoint
        # (labels[x] ≤ x for every x after init, and every comp value
        # is a node id present in labels), and reach still compounds
        # super-linearly per round (≥ Fibonacci: r_{t+1} ≥ r_t +
        # r_{t-1}), so O(log diameter)-class convergence is kept —
        # the diameter-64 path test passes well inside max_iter=20.
        new_labels = (
            prop.join(
                labels.select(F.col("node").alias("comp"), F.col("comp").alias("jcomp")),
                "comp",
                "left",
            )
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("jcomp", F.col("comp"))).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "iterations (label sum still decreasing); raise max_iter — "
            "an unconverged labeling would silently mislabel components"
        )
    return labels


PR_SCALE = 1_000_000_000_000  # rank mass fixed-point (per-node ~SCALE/N)
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact rational


def pagerank(
    edges: DataFrame, iters: int = 3, a: str = "a", b: str = "b"
) -> DataFrame:
    """(node, rank_scaled) after ``iters`` power-iteration rounds over
    the undirected graph ``edges``; ranks are integer fixed-point
    (total mass ≈ ``PR_SCALE``) so a DuckDB oracle with the IDENTICAL
    operation tree replays every round bit-for-bit — no float sums, no
    aggregation-order dependence.

    Per round: rank_new(v) = (15·(SCALE div N) + 85·Σ_{u→v} rank(u)
    div deg(u)) div 100, all integer division. Undirected edges mean
    every node has deg ≥ 1 — no dangling-mass correction term needed.

    Scale shape (the GraphX/Pregel loop, declaratively): the
    symmetrized edge list is built once and localCheckpoint-ed; each
    round is ONE equi-join on node id + ONE keyed sum — shuffles carry
    (node, bigint) only, never adjacency. ``iters`` is a bounded plan
    unroll (no driver loop over data; the single driver-side scalar is
    the node count, which also guards div-by-zero on an empty graph).
    """
    sym = _symmetrize(edges, a, b).localCheckpoint(eager=True)
    deg = sym.groupBy("node").agg(F.count("*").alias("deg"))
    deg = deg.localCheckpoint(eager=True)
    n = deg.count()
    if n == 0:
        return deg.select("node", F.lit(0).cast("bigint").alias("rank_scaled"))
    base = PR_SCALE // n
    ranks = deg.withColumn("rank", F.lit(base).cast("bigint"))
    for _ in range(iters):
        contrib = sym.join(ranks, "node").select(
            F.col("peer").alias("node"),
            F.expr("rank div deg").alias("c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = deg.join(sums, "node").select(
            "node",
            "deg",
            F.expr(f"({PR_DAMP_DEN - PR_DAMP_NUM} * {base}L + {PR_DAMP_NUM} * s) "
                   f"div {PR_DAMP_DEN}").alias("rank"),
        )
    return ranks.select("node", F.col("rank").cast("bigint").alias("rank_scaled"))


def pagerank_oracle_sql(edges_cte: str, iters: int = 3) -> str:
    """DuckDB twin of :func:`pagerank`: the same integer-arithmetic
    round unrolled ``iters`` times as chained CTEs (r0 → r1 → …).
    ``edges_cte`` must yield columns (a, b)."""
    base = f"(SELECT {PR_SCALE} // count(*) FROM deg)"
    ctes = [
        f"e AS ({edges_cte})",
        "sym AS (SELECT a AS node, b AS peer FROM e "
        "UNION ALL SELECT b, a FROM e)",
        "deg AS (SELECT node, count(*) AS deg FROM sym GROUP BY node)",
        f"r0 AS (SELECT node, deg, CAST({base} AS BIGINT) AS rank FROM deg)",
    ]
    for i in range(iters):
        ctes.append(
            f"r{i + 1} AS (SELECT d.node, d.deg, "
            f"CAST(({PR_DAMP_DEN - PR_DAMP_NUM} * {base} "
            f"+ {PR_DAMP_NUM} * s.s) // {PR_DAMP_DEN} AS BIGINT) AS rank "
            f"FROM deg d JOIN (SELECT sym.peer AS node, "
            f"sum(r.rank // r.deg) AS s FROM sym "
            f"JOIN r{i} r ON sym.node = r.node GROUP BY sym.peer) s "
            f"ON s.node = d.node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, rank AS rank_scaled FROM r{iters}"
    )


def cc_oracle_sql(edges_cte: str) -> str:
    """DuckDB recursive-CTE twin: min reachable node per node.

    ``edges_cte`` must yield columns (a, b). UNION (not UNION ALL)
    dedupes the frontier so the recursion terminates on cyclic graphs.
    """
    return f"""
WITH RECURSIVE e AS ({edges_cte}),
sym AS (SELECT a AS node, b AS peer FROM e UNION SELECT b, a FROM e),
reach(node, lab) AS (
  SELECT node, node FROM (SELECT DISTINCT node FROM sym)
  UNION
  SELECT s.node, r.lab FROM sym s JOIN reach r ON s.peer = r.node
)
SELECT node, min(lab) AS comp FROM reach GROUP BY node
"""
