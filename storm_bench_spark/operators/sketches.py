"""Mergeable-sketch and filter-pruning operators: HyperLogLog distinct
counting, Bloom-filter join pruning, and deletion-neighborhood fuzzy
matching.

No reference analog (storm-bench's UniqueVisitor keeps exact per-window
sets — `UniqueVisitor.java`'s SetReducer); these are the
cardinality/pruning tools a 100 TB pipeline needs where exact sets no
longer fit:

- :func:`hll_aggregate` — HyperLogLog registers as plain (key, bucket,
  rho) rows. The register table IS the sketch: it merges with ``MAX``
  (associative, commutative, idempotent — the same monoid discipline as
  ``operators/windows.py``), so partial aggregation, re-aggregation
  across time windows, and cross-partition union are all free. Nothing
  here is approximate-in-an-unreplayable-way: the hash is the portable
  ``hash64`` (md5-derived, identical in DuckDB), so the oracle rebuilds
  the exact same registers and the estimate matches bit-for-bit.
- :func:`bloom_semi_join` — the explicit runtime-filter pattern: build
  a Bloom bitmap over the dim side's join keys (one aggregation to
  ≤ ``n_bits/64`` words, folded into a single map row), broadcast it,
  prune the fact side with pure bit arithmetic, then close with an
  exact semi-join so false positives never escape. At 100 TB the win is
  that the shuffle for the closing semi-join carries only rows that
  passed the bitmap — the classic "ship the filter, not the table".
- :func:`deletion_variants` / fuzzy pairing — SymSpell-style blocking
  for edit-distance-1 candidates: two strings within one edit share a
  single-character-deletion variant, so candidate pairs come from an
  equi-join on (block, variant) instead of an n² levenshtein sweep.
  The exact ``levenshtein ≤ d`` predicate verifies candidates, so the
  result equals the brute-force join at any scale.

Float-determinism discipline (the reason the HLL estimate is
oracle-checkable at all): the harmonic denominator is summed in EXACT
integer arithmetic (``Σ 2^(R−ρ_j)`` with R = 61−p fits int64 for
p ≥ 3: ≤ 2^p · 2^(61−p−1) terms plus empties = ≤ 2^61), so no
float-sum order dependence exists; the only floating-point steps are
one int→double conversion and one divide, both IEEE-deterministic. The
linear-counting small-range branch uses per-V precomputed literals
(V ∈ 1..m−1), not a runtime ``ln`` — libm is not guaranteed identical
across engines, literals are.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from storm_bench_spark.functions.hashing import (
    hash64,
    hash64_sql,
    minhash_perm,
    minhash_perm_sql,
)

# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

HLL_P = 4  # 2^4 = 16 registers: sized for the sf fixtures (15-1500
# distinct users) so both the linear-counting branch (sf0.001) and the
# raw-estimator branch (sf0.01+) are exercised by the oracle gate. At
# production scale use p=12..14 — every formula below is parametric in
# p and the int64 exactness argument holds for any p ≥ 3.


def _hll_consts(p: int) -> tuple[int, int, float]:
    m = 1 << p
    rho_cap = 61 - p  # hash64 is 60-bit; w = h div m has 60-p bits
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1.0 + 1.079 / m))
    return m, rho_cap, alpha


def hll_registers(
    df: DataFrame, keys: Sequence[str], value_col: str, p: int = HLL_P
) -> DataFrame:
    """Sketch rows (keys..., _bucket, _r): max-rho per register bucket.

    This table is the mergeable form — union any number of register
    tables and ``MAX`` per (key, bucket) merges them exactly (used by
    the ``__all__`` rollup row in ``hll_users_per_type``, which merges
    per-type sketches WITHOUT rescanning the input).
    """
    m, rho_cap, _ = _hll_consts(p)
    # COUNT(DISTINCT) semantics: NULL is not a value. Without this
    # filter a NULL row would land in a NULL bucket whose NULL rho the
    # SUM skips while COUNT(*) still counts it — both engines would
    # agree (same formula) but the estimate would be silently wrong.
    d = df.where(F.col(value_col).isNotNull()).select(
        *keys, hash64(F.col(value_col).cast("string")).alias("_h")
    )
    w = F.expr(f"_h DIV {m}")
    # rho = leading zeros of the (60-p)-bit suffix + 1 = rho_cap - bitlen(w);
    # bitlen via length(bin(w)) is integer-exact in both engines.
    rho = F.when(w > 0, F.lit(rho_cap) - F.length(F.bin(w))).otherwise(
        F.lit(rho_cap)
    )
    return (
        d.select(*keys, (F.col("_h") % m).alias("_bucket"), rho.alias("_r"))
        .groupBy(*keys, "_bucket")
        .agg(F.max("_r").alias("_r"))
    )


def hll_estimate(registers: DataFrame, keys: Sequence[str], p: int = HLL_P) -> DataFrame:
    """Finalize register rows into (keys..., approx_distinct).

    Exact-integer harmonic sum: S = Σ 2^(rho_cap − ρ_j) over the m
    registers (empty registers contribute 2^rho_cap), then
    est_raw = α·m²·2^rho_cap / S with exactly one float divide.
    Small range (V empty registers > 0 and est ≤ 2.5m): linear counting
    m·ln(m/V) from precomputed literals.
    """
    m, rho_cap, alpha = _hll_consts(p)
    numer = alpha * m * m * float(2**rho_cap)  # python-float literal, parsed
    # identically by Spark and DuckDB from its repr
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {rho_cap} - _r)")
    fin = registers.groupBy(*keys).agg(
        (F.sum(term) + (F.lit(m) - F.count(F.lit(1))) * F.lit(2**rho_cap)).alias(
            "_s"
        ),
        (F.lit(m) - F.count(F.lit(1))).alias("_v"),
    )
    raw = F.lit(numer) / F.col("_s").cast("double")
    est = F.when((F.col("_v") > 0) & (raw <= 2.5 * m), _linear_lookup(m)).otherwise(raw)
    return fin.select(*keys, est.alias("approx_distinct"))


def _linear_lookup(m: int) -> Column:
    """Linear-counting estimate m·ln(m/V) for V ∈ 1..m−1, as ONE
    element_at over a literal array indexed by the ``_v`` column.

    Same per-V precomputed python-float literals as ever (libm is not
    guaranteed identical across engines; literals are) — but one parsed
    expression instead of an (m−1)-deep chained CASE: the chain cost
    ~100 ms of plan-build per query call at m=16 (measured round 10)
    and would be quadratic-ish in m at production p=12..14.
    """
    vals = ", ".join(repr(m * math.log(m / v)) for v in range(1, m))
    return F.element_at(F.expr(f"array({vals})"), F.col("_v").cast("int"))


def hll_registers_wide(
    df: DataFrame, keys: Sequence[str], value_col: str, p: int = HLL_P
) -> DataFrame:
    """One row per key group with the FULL register vector as m columns
    (_r0.._r{m-1}) — the vector form most HLL implementations store.

    Same hash/rho math as :func:`hll_registers`; the wide layout exists
    for window fan-out pipelines (unique_visitor_approx): fanning out
    one m-column row per slide bucket moves m× fewer rows through the
    merge shuffle than the row form, and the merge is a plain
    column-wise MAX (same monoid, so any regrouping stays exact).
    Empty registers are NULL (max over an empty when-set).

    Layout caveat (ADVICE r10): the wide form emits ONE generated agg
    expression and one output column PER register, so it targets small
    m (fixture p=4 → 16 columns). At production p=12..14 that is
    4096–16384 generated columns — plan build and codegen blow up long
    before the data does. At those precisions keep the ROW form
    (:func:`hll_registers`) or pack registers into a single
    binary/array column; the wide layout's shuffle-volume win only
    pays while m is small relative to the group count. The same bound
    applies to :func:`hll_merge_wide` / :func:`hll_estimate_wide`.
    """
    m, rho_cap, _ = _hll_consts(p)
    d = df.where(F.col(value_col).isNotNull()).select(
        *keys, hash64(F.col(value_col).cast("string")).alias("_h")
    )
    w = F.expr(f"_h DIV {m}")
    rho = F.when(w > 0, F.lit(rho_cap) - F.length(F.bin(w))).otherwise(
        F.lit(rho_cap)
    )
    b = d.select(*keys, (F.col("_h") % m).alias("_b"), rho.alias("_r"))
    # one parsed expression per register, not a composed when/max
    # Column tree: the loop of Column operators costs 4 py4j round
    # trips per register and dominated plan-build time (house rule,
    # see operators/similarity.py's unrolled-dot note)
    return b.groupBy(*keys).agg(
        *[
            F.expr(f"max(CASE WHEN _b = {j} THEN _r END)").alias(f"_r{j}")
            for j in range(m)
        ]
    )


def hll_merge_wide(df: DataFrame, keys: Sequence[str], p: int = HLL_P) -> DataFrame:
    """Merge wide register rows by column-wise MAX per key group
    (NULL-skipping max = empty registers stay empty)."""
    m, _, _ = _hll_consts(p)
    return df.groupBy(*keys).agg(
        *[F.expr(f"max(_r{j})").alias(f"_r{j}") for j in range(m)]
    )


def hll_estimate_wide(
    registers: DataFrame, keys: Sequence[str], p: int = HLL_P
) -> DataFrame:
    """Finalize wide register rows into (keys..., approx_distinct) —
    a pure PROJECTION (no aggregation): the harmonic denominator is the
    m-term exact-integer sum over the register columns (empty → the
    2^rho_cap term, via coalesce), so the whole estimate costs zero
    shuffles once the registers are merged. Bit-identical to
    :func:`hll_estimate`: same integer S, same one float divide, same
    literal linear-counting table.
    """
    m, rho_cap, alpha = _hll_consts(p)
    numer = alpha * m * m * float(2**rho_cap)
    # single parsed expressions (integer adds: order-free, exact)
    s = F.expr(
        " + ".join(
            f"coalesce(shiftleft(CAST(1 AS BIGINT), {rho_cap} - _r{j}), "
            f"CAST({2**rho_cap} AS BIGINT))"
            for j in range(m)
        )
    )
    v = F.expr(
        " + ".join(f"CAST((_r{j} IS NULL) AS INT)" for j in range(m))
    )
    pre = registers.select(*keys, s.alias("_s"), v.alias("_v"))
    raw = F.lit(numer) / F.col("_s").cast("double")
    est = F.when((F.col("_v") > 0) & (raw <= 2.5 * m), _linear_lookup(m)).otherwise(raw)
    return pre.select(*keys, est.alias("approx_distinct"))


def hll_estimate_sql(
    source_sql: str,
    key_expr: str | Sequence[str],
    value_expr: str,
    key_out: str | Sequence[str] = "k",
    p: int = HLL_P,
) -> str:
    """DuckDB replay of registers+estimate for oracle composition.

    ``source_sql`` is a FROM-able relation; ``key_expr`` / ``value_expr``
    are column expressions over it (``key_expr`` may be a sequence for
    composite keys, paired positionally with ``key_out``). Returns a
    SELECT producing (keys..., approx_distinct) — the exact twin of
    ``hll_estimate(hll_registers(...))``.
    """
    keys = [key_expr] if isinstance(key_expr, str) else list(key_expr)
    outs = [key_out] if isinstance(key_out, str) else list(key_out)
    if len(keys) != len(outs):
        raise ValueError("key_expr / key_out arity mismatch")
    kcols = [f"k{i}" for i in range(len(keys))]
    ksel = ", ".join(f"{e} AS {c}" for e, c in zip(keys, kcols))
    klist = ", ".join(kcols)
    kout = ", ".join(f"{c} AS {o}" for c, o in zip(kcols, outs))
    m, rho_cap, alpha = _hll_consts(p)
    numer = alpha * m * m * float(2**rho_cap)
    h = hash64_sql(f"CAST({value_expr} AS VARCHAR)")
    lin_cases = " ".join(
        f"WHEN {v} THEN {m * math.log(m / v)!r}" for v in range(1, m)
    )
    return f"""
WITH hll_h AS (
  SELECT {ksel}, {h} AS h FROM {source_sql}
  WHERE {value_expr} IS NOT NULL
), hll_reg AS (
  SELECT {klist}, h % {m} AS bucket,
         MAX(CASE WHEN h // {m} > 0 THEN {rho_cap} - length(bin(h // {m}))
                  ELSE {rho_cap} END) AS r
  FROM hll_h GROUP BY {klist}, h % {m}
), hll_fin AS (
  SELECT {klist},
         SUM(CAST(1 AS BIGINT) << ({rho_cap} - r))
           + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {rho_cap}) AS s,
         {m} - COUNT(*) AS v
  FROM hll_reg GROUP BY {klist}
)
SELECT {kout},
       CASE WHEN v > 0 AND {numer!r} / CAST(s AS DOUBLE) <= {2.5 * m}
            THEN CASE v {lin_cases} END
            ELSE {numer!r} / CAST(s AS DOUBLE) END AS approx_distinct
FROM hll_fin
"""


# ---------------------------------------------------------------------------
# Bloom-filter join pruning
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 13  # 8192 bits = 128 int64 words; with k=3 hashes the
# map row stays ~1 KB — broadcast-trivial. Production sizing: n_bits ≈
# 10·|dim keys| for ~1% false positives; the closing semi-join keeps
# results exact at ANY false-positive rate, sizing only tunes shuffle
# volume.
BLOOM_K = 3


def _bloom_positions(key: Column, n_bits: int, k: int) -> list[Column]:
    h = hash64(key.cast("string"))
    return [minhash_perm(h, i) % n_bits for i in range(k)]


def bloom_bitmap(
    dim: DataFrame, key_col: str, n_bits: int = BLOOM_BITS, k: int = BLOOM_K
) -> DataFrame:
    """One-row DataFrame (``_bloom``: map<int,bigint>) — the bitmap as
    word-index → 64-bit word, built with a single aggregation. Missing
    words are all-zero (element_at → NULL → coalesce 0 on probe)."""
    pos = F.explode(
        F.array(*_bloom_positions(F.col(key_col), n_bits, k))
    ).alias("_pos")
    words = (
        dim.select(pos)
        .select(
            F.expr("_pos DIV 64").cast("int").alias("_w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias(
                "_bit"
            ),
        )
        .groupBy("_w")
        .agg(F.expr("bit_or(_bit)").alias("_mask"))
    )
    return words.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("_w", "_mask"))).alias("_bloom")
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """``fact`` rows whose ``on`` key exists in ``dim`` — exact semi-join
    semantics, Bloom-pruned.

    The bitmap broadcast-crossJoins onto the fact (one row — the same
    bounded-broadcast discipline as relational.py's count row); the
    probe is pure column bit arithmetic (whole-stage codegen, no UDF,
    no explode on the fact side — the k probes are unrolled columns).
    Rows passing all k bit tests proceed to the exact left-semi join;
    everything else never enters the shuffle. No false negatives by
    construction: every true key set its own bits.
    """
    bitmap = F.broadcast(bloom_bitmap(dim.select(on), on, n_bits, k))
    probed = fact.crossJoin(bitmap)
    pcols = [f"_bp{i}" for i in range(k)]
    probed = probed.withColumns(
        dict(zip(pcols, _bloom_positions(F.col(on), n_bits, k)))
    )
    cond = " AND ".join(
        f"(shiftright(coalesce(element_at(_bloom, CAST({p} DIV 64 AS INT)),"
        f" CAST(0 AS BIGINT)), CAST({p} % 64 AS INT)) & 1) = 1"
        for p in pcols
    )
    passed = probed.where(F.expr(cond)).drop("_bloom", *pcols)
    return passed.join(dim.select(on).distinct(), on, "left_semi")


# ---------------------------------------------------------------------------
# Deletion-neighborhood fuzzy matching (SymSpell blocking)
# ---------------------------------------------------------------------------


def deletion_variants(col: Column) -> Column:
    """Array of the string itself plus every single-character deletion.

    Two strings u, v with ``levenshtein(u, v) ≤ 1`` always share a
    variant: substitution at i → both delete i; insertion/deletion →
    the shorter string IS a variant of the longer (hence the identity
    element); equality → the identity. So an equi-join on variants is
    a lossless candidate generator for edit distance ≤ 1.
    """
    deletes = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            col.substr(F.lit(1), i - F.lit(1)),
            col.substr(i + F.lit(1), F.length(col)),
        ),
    )
    return F.array_distinct(F.concat(F.array(col), deletes))


def deletion_variants2(col: Column) -> Column:
    """Depth-2 deletion neighborhood: the string, every 1-delete, and
    every 2-delete (positions i < j removed).

    The SymSpell guarantee extends: ``levenshtein(u, v) ≤ 2`` implies
    ``deletes≤2(u) ∩ deletes≤2(v) ≠ ∅`` (align u and v; deleting the
    ≤2 mismatched positions from each side yields a common string), so
    the equi-join stays a lossless candidate generator at distance 2.
    Variant count is 1 + L + C(L,2) — ~190 for 18-char keys; the
    candidate table stays linear in input because variants, like the
    strings, are per-row bounded.
    """
    d2 = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.transform(
                F.sequence(i + F.lit(1), F.length(col)),
                # delete positions i and j (i < j): three substrings
                lambda j: F.concat(
                    col.substr(F.lit(1), i - F.lit(1)),
                    col.substr(i + F.lit(1), j - i - F.lit(1)),
                    col.substr(j + F.lit(1), F.length(col)),
                ),
            ),
        )
    )
    return F.array_distinct(F.concat(deletion_variants(col), d2))


# Verify-stage strategy gate: name DICTIONARIES up to this many rows
# are broadcast for the map-side attach+verify path (~a few hundred MB
# serialized at typical name widths — well under executor memory and
# Spark's broadcast cap); larger dictionaries take the shuffle path.
VERIFY_BROADCAST_MAX_NAMES = 4_000_000


def fuzzy_pairs(
    df: DataFrame,
    block_cols: Sequence[str],
    name_col: str,
    max_dist: int = 1,
    sig_len: int | None = 12,
) -> DataFrame:
    """Distinct pairs (block..., name1, name2) with ``name1 < name2``
    and ``levenshtein ≤ max_dist`` inside each block.

    Candidates come from the deletion-variant equi-join (depth-matched
    to ``max_dist`` 1 or 2 — the SymSpell neighborhood is lossless at
    its own depth). The exact levenshtein predicate runs AFTER the
    pair ``distinct()`` so each surviving pair pays one edit-distance
    evaluation, not one per shared variant; names attach to the
    distinct pairs via a broadcast of the name dictionary when it is
    broadcast-small, else via co-partitioned shuffle joins (see the
    broadcast-gated attach comment in the body).

    SIGNATURE TRUNCATION (``sig_len``, round 7 — the candidate fan-in
    cut VERDICT r6 #1 asked for): variants are generated over only the
    LAST ``sig_len`` characters of each name, not the whole string.
    Variant count per name drops from 1 + L + C(L,2) to
    1 + P + C(P,2) — for the fixture's 18-22 char names at P=12 that
    is ~3-4x fewer variant rows through the explode/exchange/persist/
    self-join, the whole cost center of this operator. Losslessness
    (the SymSpell prefix-truncation theorem, suffix-mirrored since
    reversal preserves edit distance): if ``lev(u, v) = d ≤ max_dist``
    then the depth-``d`` deletion sets of ``suffix_P(u)`` and
    ``suffix_P(v)`` intersect. Proof: fix an optimal alignment; let w
    be the matched chars whose positions are ≤ P from the end in BOTH
    strings. Each side deletes (its mismatched chars in the window,
    ≤ #subs + its own indels) plus (matched chars whose partner falls
    outside the window, ≤ the alignment shift ≤ the OTHER side's
    indels) — per-side total ≤ d. Both sides reach the same w, so the
    equi-join on variant hashes still finds every true pair; the exact
    full-string levenshtein verify then removes the extra candidates
    truncation admits (names agreeing on the suffix but differing
    earlier). ``tests/test_sketches.py`` brute-forces the theorem over
    random short-alphabet pairs, and the registered queries' quadratic
    DuckDB oracles certify it end-to-end. The suffix end is the right
    one for key-like corpora (ids vary at the tail); ``None`` disables
    truncation. A DEGENERATE-SIGNATURE caveat, documented not guarded:
    if many names share one suffix (tail-constant corpora), candidate
    buckets go quadratic — pick the varying end, or None.

    The candidate machinery runs on 8-byte NAME IDS, never strings:
    the depth-2 variant table is ~L²/2 rows per name, and at 100×
    scale carrying the name string through the explode made the
    persisted table spill-and-GC-bound (the superlinear term the scale
    smoke measured — strings tripled the row width). Names are hashed
    once (``xxhash64``), the explode/shuffle/join/distinct all move
    ``(block, nid, vh)`` longs, and the strings come back either
    from the broadcast dictionary (map-side, small-dictionary regime)
    or via one keyed join of the distinct PAIR table against the names
    table (large-dictionary regime) before the levenshtein verify. An nid collision
    inside a block cannot lose a pair: colliding names are caught by
    the dedicated same-nid branch below (a names-table self-join on
    (block, nid) — group sizes are 1 absent collisions, so it costs
    one names-table shuffle and usually yields zero rows), and a
    collision elsewhere only merges candidate rows the re-attach
    expands back out, with the levenshtein verify dropping any false
    combination. Variant hashes share the argument: equal variants
    hash equal (no lost candidate), unequal variants colliding only
    add a candidate the verify removes.

    Cache lifetime: the variant table is persisted (the self-join's
    two sides must share one explode) but this function returns a LAZY
    plan, so it cannot unpersist its own intermediate. Long-lived
    sessions running many queries must release between queries —
    ``spark.catalog.clearCache()`` (bench.py does; the blocks are
    MEMORY_AND_DISK, so an unreleased session degrades to disk spill,
    never OOM).
    """
    if sig_len is not None and sig_len < max_dist + 1:
        raise ValueError(f"sig_len={sig_len} too short for max_dist={max_dist}")
    sig = F.col("_n") if sig_len is None else F.expr(f"right(_n, {int(sig_len)})")
    if max_dist == 1:
        variants = deletion_variants(sig)
    elif max_dist == 2:
        variants = deletion_variants2(sig)
    else:
        raise ValueError("deletion-neighborhood blocking supports max_dist 1 or 2")
    from pyspark.storagelevel import StorageLevel

    names = (
        df.select(*block_cols, F.col(name_col).alias("_n"))
        .distinct()
        .withColumn("_nid", F.xxhash64("_n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # The variant table is REPARTITIONED ON THE JOIN KEY before the
    # persist: without the explicit exchange, the static planner sizes
    # the exploded side from the input FILE (explode keeps child
    # stats), decides it is broadcast-small, and at scale the
    # broadcast build collects the whole variant table to the driver
    # — the 100× smoke failed exactly there (maxResultSize at 285M
    # variant rows). Behind a real exchange, AQE picks the strategy
    # from ACTUAL sizes: broadcast at fixture scale, shuffled join at
    # 100×, and the co-partitioning means the self-join adds no
    # further shuffle either way.
    v = names.select(
        *block_cols,
        "_nid",
        F.explode(variants).alias("_var"),
    ).select(
        *block_cols, "_nid", F.xxhash64("_var").alias("_vh")
    ).repartition(*block_cols, "_vh").persist(StorageLevel.MEMORY_AND_DISK)
    # SHUFFLE_HASH hint on the variant self-join (round 7): the default
    # SortMergeJoin SORTS both 90M+-row sides at R=100, and the sorts
    # cost more than the join itself. A hash join here is scale-safe
    # where broadcast is not: the build side is one co-partitioned
    # PARTITION of the variant table (variant-bucket sizes are bounded
    # by block size), never a whole corpus-sized side on the driver.
    left = v.select(*block_cols, F.col("_nid").alias("_nid1"), "_vh")
    right = v.select(*block_cols, F.col("_nid").alias("_nid2"), "_vh")
    raw = (
        left.join(right.hint("SHUFFLE_HASH"), [*block_cols, "_vh"])
        .where(F.col("_nid1") < F.col("_nid2"))
        .select(*block_cols, "_nid1", "_nid2")
    )
    n1 = names.select(*block_cols, F.col("_nid").alias("_nid1"), F.col("_n").alias("_na"))
    n2 = names.select(*block_cols, F.col("_nid").alias("_nid2"), F.col("_n").alias("_nb"))
    cand = raw.distinct()
    # BROADCAST-GATED NAME ATTACH (round 7, the R=100 cut): profiled
    # at R=100, the two shuffle joins attaching names to the ~73M
    # distinct candidates cost as much as the candidate distinct
    # itself (~45 s each). When the name DICTIONARY (post-distinct
    # names, NOT the input row count) fits a broadcast, the attach
    # runs map-side with zero candidate shuffle — measured 117 s →
    # 84 s end-to-end. The gate is an actual dictionary count (the
    # persist is materialized by every downstream path anyway), so
    # the decision is made from real cardinality, not file-size
    # guesses; above the cap (dictionary > ~4M names ≈ a few hundred
    # MB broadcast) the plan falls back to co-partitioned SHUFFLE_HASH
    # attach joins, which never ship a corpus-sized side. Two orders
    # that measured WORSE at R=100, so the distinct stays first:
    # verify-before-distinct (lev on the raw dup-bearing stream, then
    # distinct on survivors) looks like it should shrink the exchange,
    # but true pairs average ~4 shared variants, so the verified
    # stream (67M) is as big as the distinct candidate set (73M) and
    # the fused scan+join+verify+partial-agg stage ran 3.5× slower;
    # and distinct-on-attached-strings shuffles 25-char string pairs
    # where longs suffice.
    if names.count() <= VERIFY_BROADCAST_MAX_NAMES:
        attached = (
            cand.join(F.broadcast(n1), [*block_cols, "_nid1"])
            .join(F.broadcast(n2), [*block_cols, "_nid2"])
        )
    else:
        attached = (
            cand.join(n1.hint("SHUFFLE_HASH"), [*block_cols, "_nid1"])
            .join(n2.hint("SHUFFLE_HASH"), [*block_cols, "_nid2"])
        )
    attached = attached.select(
        *block_cols,
        F.least("_na", "_nb").alias("name1"),
        F.greatest("_na", "_nb").alias("name2"),
    ).where(F.levenshtein("name1", "name2") <= max_dist)
    # same-nid branch: pairs of DISTINCT names sharing one hash inside
    # a block — the only candidates the nid1 < nid2 filter can drop
    eq = (
        names.select(*block_cols, "_nid", F.col("_n").alias("_na"))
        .join(names.select(*block_cols, "_nid", F.col("_n").alias("_nb")), [*block_cols, "_nid"])
        .where(F.col("_na") < F.col("_nb"))
        .select(*block_cols, F.col("_na").alias("name1"), F.col("_nb").alias("name2"))
        .where(F.levenshtein("name1", "name2") <= max_dist)
    )
    return attached.unionByName(eq)
