"""TPC-H queries 2/7/8/9/11/13/15/16/17/18/20/21/22 — completing the
22-query suite started in :mod:`storm_bench_spark.plans.tpch`.

The fixture star schema (TESTDATA.md) has no ``partsupp`` table and no
comment/phone/container/commitdate/receiptdate columns, so the queries
that touch those are ADAPTED, preserving the spec query's plan shape
(the join topology, subquery correlation pattern, and aggregation
structure) while substituting fixture-expressible predicates:

- part↔supplier relationships come from ``lineitem`` (l_partkey,
  l_suppkey) instead of ``partsupp``; "supply cost" is the minimum
  observed unit price ``l_extendedprice / l_quantity`` (q2), "stock
  value" is shipped value (q11), "availqty vs demand" is pair-shipped
  vs part-average quantity (q20);
- q9's ``ps_supplycost`` term becomes ``0.01 · p_retailprice ·
  l_quantity`` (deterministic cost proxy; the profit expression keeps
  the revenue-minus-cost shape);
- q13's comment filter becomes an ``o_orderpriority`` exclusion;
- q21's "late" predicate is ``l_shipdate > o_orderdate + 365 days``
  (same adaptation as tpch.py's q4/q12: no commit/receipt dates);
- q22's phone country code becomes ``CAST(c_nationkey AS STRING)``
  and "has no orders" becomes "has no orders since 1999" (every
  fixture customer has at least one order).

Every adaptation is applied identically in the Spark plan and the
DuckDB oracle, so the correctness gate still checks real equivalence.
Decimal-exact aggregation discipline (``_dsum``) is inherited from
tpch.py: per-row DECIMAL(18,6) casts make sums associative and
partition-order-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storm_bench_spark.plans.registry import register
from storm_bench_spark.plans.tpch import DEC_ROW as DEC
from storm_bench_spark.plans.tpch import _dsum
from storm_bench_spark.sources.tables import load_table


# --- Q2: minimum-cost supplier (correlated min subquery) -----------------

@register(
    "tpch_q2",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eligible AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
  FROM part
  JOIN cost ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size <= 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM eligible e
WHERE unit_cost = (SELECT min(unit_cost) FROM eligible e2 WHERE e2.p_partkey = e.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's shape — the correlated "minimum supply cost per part"
    subquery becomes a per-part window min over the already-filtered
    eligible set (one shuffle on p_partkey; the spec's subquery would
    rescan). partsupp is adapted to the lineitem-derived unit-cost
    table (module docstring). Dims broadcast. The unit cost stays a
    raw DOUBLE: IEEE division and min are bitwise-identical in both
    engines, while a DECIMAL(18,6) cast would hit round-half midpoints
    (e.g. 597.4703125) where Spark rounds HALF_UP and DuckDB
    half-even — so no decimal step here, and the equality predicate
    compares identical doubles."""
    l = load_table(spark, sf_dir, "lineitem")
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("_uc")
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eligible = (
        cost.join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .join(F.broadcast(s), cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("_uc").alias("unit_cost"),
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("_min_uc", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("_min_uc"))
        .drop("_min_uc")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --- Q7: volume shipping between two nations -----------------------------

@register(
    "tpch_q7",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 — two-nation volume by ship year. The OR-of-pairs predicate
    stays a join-level filter after both nation dims (broadcast)
    attach; fact-side filters (shipdate) push to the scan."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1k"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2k"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1k"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2k"))
        .where(pair)
    )
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))


# --- Q8: national market share -------------------------------------------

@register(
    "tpch_q8",
    oracle="""
SELECT o_year,
       CAST(sum(CASE WHEN nation = 'NATION_1'
                     THEN CAST(volume AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE)
       / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 — market share of one supplier nation inside a customer
    region. 8-way star join: every dim broadcasts, the only shuffles
    are lineitem⋈orders and the final tiny groupBy. The share is a
    ratio of two exact decimal sums, divided once in double space —
    deterministic cross-engine."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("n1k"), F.col("n_regionkey").alias("n1r"))
    n2 = n.select(F.col("n_nationkey").alias("n2k"), F.col("n_name").alias("nation"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1k"))
        .join(F.broadcast(r), F.col("n1r") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2k"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    return (
        j.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("nation") == "NATION_1", vol).otherwise(F.lit(0).cast(DEC)))
            .cast("double").alias("_num"),
            F.sum(vol).cast("double").alias("_den"),
        )
        .select("o_year", (F.col("_num") / F.col("_den")).alias("mkt_share"))
        .orderBy("o_year")
    )


# --- Q9: product-type profit by nation and year --------------------------

@register(
    "tpch_q9",
    oracle="""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     - 0.01 * p_retailprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
         AS sum_profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
""",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 — profit by supplier nation and order year; the
    ``ps_supplycost·l_quantity`` cost term is adapted to
    ``0.01·p_retailprice·l_quantity`` (no partsupp in the fixture),
    keeping the revenue-minus-cost aggregate shape. The p_name LIKE
    filter prunes part before its broadcast."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.01 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(_dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --- Q11: important stock identification (HAVING vs global scalar) -------

@register(
    "tpch_q11",
    oracle="""
WITH val AS (
  SELECT l_partkey AS ps_partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS v
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_8')
  GROUP BY l_partkey
)
SELECT ps_partkey, CAST(v AS DOUBLE) AS value
FROM val
WHERE CAST(v AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) * 0.001 FROM val)
ORDER BY value DESC, ps_partkey
""",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 — per-part value with a HAVING-against-global-fraction
    predicate. "Stock value" is adapted to shipped value via the
    lineitem link (no partsupp). The global threshold is a 1-row agg
    broadcast into a cross join (the relational.py:344 pattern). The
    comparison is done in DOUBLE on both sides with the identical
    tree — ``CAST(v) > CAST(sum(v)) * 0.001`` — because Spark types
    ``sum(decimal) * 0.001`` as double while DuckDB keeps it decimal:
    comparing each engine's native mixed types can disagree within a
    ulp of the threshold; the explicit double casts make both engines
    round the exact decimal sums identically first. The per-part agg
    is reused for both the rows and the scalar — one shuffle, the
    threshold branch rides the same exchange."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_8")
    )
    val = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)).alias("v")
        )
    )
    thresh = val.agg((F.sum("v").cast("double") * F.lit(0.001)).alias("_t"))
    return (
        val.crossJoin(F.broadcast(thresh))
        .where(F.col("v").cast("double") > F.col("_t"))
        .select("ps_partkey", F.col("v").cast("double").alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


# --- Q13: customer order-count distribution ------------------------------

@register(
    "tpch_q13",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 — two-level aggregation over a LEFT OUTER join (customers
    with zero qualifying orders must survive as c_count = 0). The
    comment NOT LIKE filter is adapted to an o_orderpriority exclusion
    inside the join condition — same placement, so non-matching
    customers are kept, not dropped."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- Q15: top supplier (agg equal to global max) -------------------------

@register(
    "tpch_q15",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
ORDER BY s_suppkey
""",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 — the view-plus-scalar-max shape: quarterly revenue per
    supplier, keep suppliers at the global max. The max rides a 1-row
    broadcast cross join against the same aggregate (decimal-exact, so
    the equality join cannot be split by double rounding)."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("_mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# --- Q16: parts/supplier relationship (NOT IN anti-join) -----------------

@register(
    "tpch_q16",
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 — distinct-supplier counts per part attribute triple, with
    an excluded-supplier NOT IN expressed as a LEFT ANTI join (the
    exclusion set — "complaint" suppliers, adapted to negative
    acctbal — is dim-sized, so the anti join broadcasts). The
    part↔supplier pairs come from lineitem (module docstring)."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --- Q17: small-quantity-order revenue (correlated avg) ------------------

@register(
    "tpch_q17",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
""",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 — the correlated per-part average becomes a keyed aggregate
    joined back to the fact rows (one extra shuffle on l_partkey
    instead of a rescan per row). The average is an exact decimal sum
    divided by the count in double space — bitwise identical in both
    engines, so the < threshold cannot disagree. The container filter
    is dropped (no p_container in the fixture); brand filter kept."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    per_part = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("*")).alias("_avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(per_part, l.l_partkey == F.col("_pk"))
        .where(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg((_dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"))
    )


# --- Q18: large-volume customers (IN over grouped HAVING) ----------------

@register(
    "tpch_q18",
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_sec, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_sec, o_orderkey
LIMIT 100
""",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 — the IN-over-HAVING subquery is a LEFT SEMI join against
    the grouped lineitem (threshold 300 fits the fixture's quantity
    distribution: p99 of per-order totals is ~262). The semi join's
    build side is the aggregated orderkey set — small after HAVING, so
    it broadcasts; the outer 3-way join then re-aggregates only
    surviving orders."""
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_sq"))
        .where(F.col("_sq") > 300)
        .select(F.col("l_orderkey").alias("_big_ok"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        l.join(F.broadcast(big), l.l_orderkey == F.col("_big_ok"), "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate").cast("long").alias("o_sec"),
            "o_totalprice", "sum_qty",
        )
        # o_orderkey completes the total order: with (totalprice, sec)
        # alone, a tie straddling position 100 lets the two engines
        # keep different row SETS at the LIMIT cutoff
        .orderBy(F.desc("o_totalprice"), "o_sec", "o_orderkey")
        .limit(100)
    )


# --- Q20: potential part promotion (nested IN) ---------------------------

@register(
    "tpch_q20",
    oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS pair_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
), part_avg AS (
  SELECT l_partkey AS apk, CAST(sum(CAST(pair_qty AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty
  FROM shipped GROUP BY l_partkey
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_2', 'NATION_7', 'NATION_12')
  AND s_suppkey IN (
    SELECT l_suppkey FROM shipped
    JOIN part_avg ON apk = l_partkey
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND pair_qty > 0.5 * avg_qty
  )
ORDER BY s_name
""",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 — nested IN subqueries as chained semi joins: suppliers
    (in a nation set) who over-shipped some 'small%' part, where
    "over-shipped" adapts availqty-vs-half-demand to pair quantity >
    half the part's average pair quantity (no partsupp). Both inner
    aggregates reuse the same keyed shuffle; the part-name filter is a
    broadcast semi join before the threshold compare."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    shipped = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("pair_qty")
    )
    part_avg = shipped.groupBy(F.col("l_partkey").alias("apk")).agg(
        (F.sum(F.col("pair_qty").cast(DEC)).cast("double") / F.count("*")).alias("avg_qty")
    )
    small = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    over = (
        shipped.join(F.broadcast(small), shipped.l_partkey == small.p_partkey, "left_semi")
        .join(part_avg, shipped.l_partkey == F.col("apk"))
        .where(F.col("pair_qty") > 0.5 * F.col("avg_qty"))
        .select(F.col("l_suppkey").alias("_ok_supp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_2", "NATION_7", "NATION_12")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(over, s.s_suppkey == F.col("_ok_supp"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_name")
    )


# --- Q21: suppliers who kept orders waiting ------------------------------

@register(
    "tpch_q21",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 365 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 365 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 — the EXISTS / NOT EXISTS pair over sibling lineitems
    collapses to ONE keyed aggregate per order: count distinct
    suppliers and distinct LATE suppliers ("late" adapted to
    l_shipdate > o_orderdate + 365d; no commit/receipt dates). A late
    line of supplier S waits iff the order has >1 supplier and S is
    its only late one — exactly the spec's correlated-subquery pair,
    without rescanning lineitem twice per row. One shuffle builds the
    per-order stats, one joins them back to the late lines."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    lo = l.join(
        o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey")
    ).withColumn(
        "_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("_n_supp"),
        F.count_distinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias("_n_late"),
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    waits = (
        lo.where(F.col("_late"))
        .join(per_order.where((F.col("_n_supp") > 1) & (F.col("_n_late") == 1)), "l_orderkey")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return (
        waits.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# --- Q22: global sales opportunity (anti-join + scalar avg) --------------

_Q22_CODES = ("1", "5", "9", "13", "17", "21", "24")
_Q22_CODES_SQL = ", ".join(f"'{c}'" for c in _Q22_CODES)

@register(
    "tpch_q22",
    oracle=f"""
WITH pool AS (
  SELECT CAST(c_nationkey AS VARCHAR) AS cntrycode, c_custkey, c_acctbal
  FROM customer
  WHERE CAST(c_nationkey AS VARCHAR) IN ({_Q22_CODES_SQL})
)
SELECT cntrycode, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM pool p
WHERE c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*)
    FROM pool WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = p.c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY cntrycode
ORDER BY cntrycode
""",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 — wealthy-but-inactive customers per country code. The
    phone-prefix code adapts to the stringified nation key and "no
    orders" to "no orders since 1999" (every fixture customer has
    orders). Shape preserved: IN-list filter, scalar avg subquery
    (broadcast 1-row cross join, decimal-exact), and a LEFT ANTI join
    against recent orders."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.col("c_nationkey").cast("string")
    )
    pool = c.where(F.col("cntrycode").isin(*_Q22_CODES))
    avg_bal = pool.where(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("*")).alias("_avg")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01"))
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
