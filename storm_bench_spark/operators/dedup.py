"""Near-duplicate detection operators: MinHash+LSH, SimHash, exact
similarity join.

Engine extensions for corpus curation at 100 TB (no reference analog —
the closest relatives are the Distinct/SetReducer set aggregates). The
design rule: candidate generation must be JOIN-ON-KEY (band digest,
hamming nibble, shared rare shingle), never an O(n²) cross join; the
expensive exact verification then runs only on candidates.

Every step uses the portable md5-derived hash (functions/hashing.py) so
a DuckDB oracle reproduces results bit-for-bit; each Spark builder here
has a ``*_sql`` twin generating that oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from storm_bench_spark.functions.hashing import (
    MERSENNE_31,
    hash64,
    hash64_sql,
    minhash_perm,
    minhash_perm_sql,
)
from storm_bench_spark.functions.text import WS_RUN_PATTERN, bind, word_split

# --- word 3-gram shingles (set semantics) --------------------------------

# explicit class (not \s): RE2 vs Java disagree on \x0b — see
# functions/text.py:WS_RUN_PATTERN
WORDS_SQL = f"list_filter(string_split_regex(text, '{WS_RUN_PATTERN}'), w -> w <> '')"
SHINGLES_SQL = f"""
SELECT doc_id, unnest(list_distinct(list_transform(
         range(1, greatest(len(w) - 1, 1)),
         i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS sh
FROM (SELECT doc_id, {WORDS_SQL} AS w FROM documents)
WHERE len(w) >= 3
"""


def shingle_array(wv) -> F.Column:
    """Word 3-gram shingle array from a bound token-array variable."""
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(wv) - 3, F.lit(0))),
        lambda i: F.concat_ws(" ", F.get(wv, i), F.get(wv, i + 1), F.get(wv, i + 2)),
    )


def shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, sh): DISTINCT word 3-gram shingles per document.

    The token array is bound once per row (``bind``) — without it the
    whitespace split re-runs for every ``get(w, i)`` in the shingle
    lambda, which is quadratic in document length.
    """
    return shingle_arrays(docs).select("doc_id", F.explode("shs").alias("sh"))


def shingle_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, shs): the distinct shingle SET of each doc as one array row.

    This is the materialization unit for multi-consumer pipelines:
    a near-dup query needs shingles for DF counting, both self-join
    sides, and both verification sides — consumed lazily, Spark
    re-derives the scan+tokenize+shingle subtree once PER CONSUMER
    (measured 8 FileScans in the uncached ngram_jaccard plan). One
    row per doc (vs one per shingle) makes this the cheap thing to
    ``persist``: callers cache it, every consumer reads the
    InMemoryRelation, and the text is tokenized exactly once.
    """
    w = word_split("text")
    arr = bind(w, lambda wv: F.array_distinct(shingle_array(wv)))
    return docs.where(F.size(w) >= 3).select("doc_id", arr.alias("shs"))


# --- MinHash signatures + LSH banding ------------------------------------

N_PERMS = 32
N_BANDS = 8
ROWS_PER_BAND = N_PERMS // N_BANDS


def minhash_signature_arrays(arr: DataFrame) -> DataFrame:
    """Signatures WITHOUT a shuffle: per-permutation min over each
    doc's shingle ARRAY (one row in, one row out — no explode, no
    groupBy exchange). Min of ``minhash_perm`` over the doc's shingle
    set — exactly what :func:`minhash_signature_sql`'s row-based
    oracle computes, so the oracle verifies this spelling unchanged.
    Replaces (round 7) the explode → 32-min groupBy spelling, whose
    exchange carried one signature row per doc across the cluster for
    no reason — the array already holds the doc's whole shingle set
    on one row.

    The hash reduction ``hash64(s) % M`` is BOUND once per row
    (functions/text.py:bind) so each shingle hashes once, not once per
    permutation; the 32 permutations then run as array_min over pure
    lambda-variable reads.
    """
    # One parsed SQL string (similarity.py's _dot_terms rule): the
    # per-permutation Column/lambda loop cost ~250 py4j round trips of
    # pure DataFrame-build time on every encounter — the dominant cost
    # of the whole minhash family at bench SF (phase_profile:
    # minhash_lsh build_s 1.1 of 1.6 total). The text reproduces the
    # bind() shape exactly — hash the shingle array ONCE into a bound
    # lambda variable via the one-element-array transform trick, then
    # one array_min per permutation over pure variable reads — so the
    # analyzed expression, and therefore every signature value, is
    # unchanged.
    from storm_bench_spark.functions.hashing import PERMS_64

    hs_sql = (
        "transform(shs, s -> "
        f"CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) % {MERSENNE_31})"
    )
    fields = ", ".join(
        f"'mh{i}', array_min(transform(hv, x -> "
        f"((x % {MERSENNE_31}) * {PERMS_64[i][0]} + {PERMS_64[i][1]}) % {MERSENNE_31}))"
        for i in range(N_PERMS)
    )
    sig = F.expr(f"get(transform(array({hs_sql}), hv -> named_struct({fields})), 0)")
    return arr.select("doc_id", sig.alias("_sig")).select("doc_id", "_sig.*")


def minhash_signature_sql() -> str:
    h = f"({hash64_sql('sh')} % {MERSENNE_31})"
    cols = [
        f"min({minhash_perm_sql(h, i)}) AS mh{i}" for i in range(N_PERMS)
    ]
    return f"SELECT doc_id, {', '.join(cols)} FROM sh GROUP BY doc_id"  # expects CTE sh


def band_digests(sig: DataFrame) -> DataFrame:
    """(doc_id, band, digest): md5 of each band's signature slice —
    the LSH bucket key. Equal digest ⇒ candidate pair."""
    # SQL text for the same reason as minhash_signature_arrays above.
    entries = ", ".join(
        "named_struct('band', {band}, 'digest', md5(concat_ws(',', {cols})))".format(
            band=band,
            cols=", ".join(
                f"CAST(mh{band * ROWS_PER_BAND + r} AS STRING)"
                for r in range(ROWS_PER_BAND)
            ),
        )
        for band in range(N_BANDS)
    )
    return sig.select("doc_id", F.expr(f"explode(array({entries}))").alias("e")).select(
        "doc_id", F.col("e.band").alias("band"), F.col("e.digest").alias("digest")
    )


def band_digests_sql() -> str:
    selects = []
    for band in range(N_BANDS):
        cols = ", ".join(
            f"CAST(mh{band * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        selects.append(
            f"SELECT doc_id, {band} AS band, md5(concat_ws(',', {cols})) AS digest FROM sig"
        )
    return " UNION ALL ".join(selects)


def lsh_candidates(bands: DataFrame) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one band bucket.

    The band table is PERSISTED (8 slim rows per doc): both self-join
    sides read materialized rows, so the shingle→signature→digest
    pipeline upstream runs once — including when the planner
    broadcasts one side (it does at every bench SF), which an
    exchange-reuse pin alone cannot cover.

    No explicit repartition on the bucket key: with the cache in
    place the pre-r14 ``repartition("band","digest")`` pin was pure
    overhead — on the broadcast path it hash-shuffled the probe side
    for nothing AND inserted an Exchange under the BroadcastExchange
    (the build side is collected whole regardless), and on the
    sort-merge path ENSURE_REQUIREMENTS inserts the same
    hashpartitioning over two identical cached subtrees, which
    ReuseExchange dedupes exactly as the explicit pin did.
    """
    from pyspark import StorageLevel

    bands = bands.persist(StorageLevel.MEMORY_AND_DISK)
    l = bands.alias("l")
    r = bands.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.digest") == F.col("r.digest"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


# --- exact Jaccard verification over candidate pairs ---------------------

def verify_jaccard(cands: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keeps j ≥ threshold.

    Intersection via equi-join on shingles restricted to the candidate
    pairs, sizes via a pre-aggregated per-doc count — all shuffles are
    on keys, nothing quadratic.

    ``sh`` is consumed three times (sizes, side a, side b); the
    repartition pins one doc_id exchange that all three reuse
    (ReuseExchange), so the shingle pipeline evaluates once. Alias-aware
    output partitioning lets the renamed join keys (a = doc_id) ride the
    same exchange.
    """
    sh = sh.repartition("doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sh.select(F.col("doc_id").alias("a"), "sh")
    sb = sh.select(F.col("doc_id").alias("b"), "sh")
    inter = (
        cands.join(sa, "a")
        .join(sb, ["b", "sh"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("ix"))
    )
    na = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    j = F.col("ix").cast("double") / (F.col("na") + F.col("nb") - F.col("ix"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .select("a", "b", F.round(j, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def verify_jaccard_arrays(
    cands: DataFrame, arr: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard over candidates from doc-level shingle ARRAYS.

    Joins each (small) candidate pair to the two docs' shingle sets and
    computes ``|A∩B|`` with ``array_intersect`` — no shingle-row
    explosion, no per-shingle join, no re-derivation of the shingle
    pipeline for the verify stage. ``arr`` should be the (persisted)
    output of :func:`shingle_arrays`; sizes and intersection counts are
    integers, so the quotient matches :func:`verify_jaccard` (and the
    SQL oracle) bitwise. Zero-intersection candidates are dropped
    structurally (not just by the threshold) — in the row spelling and
    the oracle such a pair produces NO row from the shingle inner join,
    so the two spellings agree even at ``threshold = 0``.
    """
    aa = arr.select(F.col("doc_id").alias("a"), F.col("shs").alias("sa"))
    bb = arr.select(F.col("doc_id").alias("b"), F.col("shs").alias("sb"))
    ix = F.size(F.array_intersect("sa", "sb")).cast("double")
    j = ix / (F.size("sa") + F.size("sb") - ix)
    return (
        cands.join(aa, "a")
        .join(bb, "b")
        .select("a", "b", F.round(j, 6).alias("jaccard"), ix.alias("_ix"))
        .where((F.col("_ix") > 0) & (F.col("jaccard") >= threshold))
        .drop("_ix")
    )


def verify_jaccard_sql(cands_cte: str, threshold: float) -> str:
    """DuckDB twin of verify_jaccard; expects CTEs ``sh`` and ``{cands_cte}``."""
    return f"""
SELECT a, b, jaccard FROM (
  SELECT i.a, i.b,
         round(CAST(i.ix AS DOUBLE) / (sa.n + sb.n - i.ix), 6) AS jaccard
  FROM (
    SELECT c.a, c.b, count(*) AS ix
    FROM {cands_cte} c
    JOIN sh x ON x.doc_id = c.a
    JOIN sh y ON y.doc_id = c.b AND y.sh = x.sh
    GROUP BY c.a, c.b
  ) i
  JOIN (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id) sa ON sa.doc_id = i.a
  JOIN (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id) sb ON sb.doc_id = i.b
)
WHERE jaccard >= {threshold}
"""


# --- SimHash (64-bit fingerprints) ---------------------------------------

N_SIMHASH_BITS = 64


def _bit_value(b: int) -> int:
    # Two's-complement value of bit b in a signed 64-bit integer: the
    # sign bit contributes -(2^63), so the bit-sum stays in BIGINT range
    # in both engines.
    return (1 << b) if b < 63 else -(1 << 63)


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 64-bit SimHash over distinct word hashes.

    Bit b of the fingerprint is the majority vote (+1/−1, ties → 0)
    of bit b across token hashes — 64 sum expressions in one groupBy,
    partial-aggregable like any sum. The 60-bit md5-derived token hash
    leaves bits 60-63 constant-zero; those fingerprint bits vote -1
    everywhere, which is harmless (identical across all docs).
    """
    w = word_split("text")
    tokens = docs.select(
        "doc_id", F.explode(F.array_distinct(w)).alias("tok")
    ).select("doc_id", hash64("tok").alias("h"))
    # Vote and fingerprint expressions are SQL TEXT parsed by F.expr
    # (similarity.py's _dot_terms rule): the per-bit Column-operator
    # loops used through round 13 cost one py4j round trip per
    # operator — ~4 s of pure DataFrame-BUILD time per encounter at
    # bench SF (phase_profile: simhash_pairs build_s 4.8 of 5.8 total)
    # — for the very same analyzed expressions. Values are unchanged:
    # identical CASE arithmetic, and the fingerprint terms are all-
    # bigint (0L/L literals) where the old chain mixed int partial
    # sums below bit 31 — both stay in range (bits 0..30 sum to at
    # most 2^31 - 1), so the results agree exactly.
    aggs = [
        F.expr(
            f"sum(CASE WHEN ((shiftright(h, {b}) & 1) = 1) THEN 1 ELSE -1 END) AS v{b}"
        )
        for b in range(N_SIMHASH_BITS)
    ]
    votes = tokens.groupBy("doc_id").agg(*aggs)
    terms = [
        (
            f"(CASE WHEN v{b} > 0 THEN {_bit_value(b)}L ELSE 0L END)"
            if b < 63
            # -(2^63): the bare literal -9223372036854775808L dies in
            # the parser (positive literal first, then negate), so the
            # sign bit's contribution is spelled as an exact in-range
            # subtraction
            else f"(CASE WHEN v{b} > 0 THEN (-9223372036854775807L - 1L) ELSE 0L END)"
        )
        for b in range(N_SIMHASH_BITS)
    ]
    fp = F.expr(f"CAST({' + '.join(terms)} AS BIGINT)")
    return votes.select("doc_id", fp.alias("simhash"))


def simhash_sql() -> str:
    h = hash64_sql("tok")
    votes = ", ".join(
        f"sum(CASE WHEN (({h}) >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(N_SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({_bit_value(b)} AS BIGINT) ELSE 0 END"
        for b in range(N_SIMHASH_BITS)
    )
    return f"""
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM (
  SELECT doc_id, {votes}
  FROM (SELECT doc_id, unnest(list_distinct({WORDS_SQL})) AS tok FROM documents)
  GROUP BY doc_id
)
"""


# Candidate generation key scheme: 4×16-bit banding is the textbook
# exact scheme for Hamming ≤ 3, but its 2^16 buckets saturate — at N
# docs each band contributes ~N²/2^17 random-collision candidates, a
# quadratic term that dominated the 10× scale smoke (ratio 5 at 500k
# docs). The subset-combination scheme (Manku et al.'s permuted-table
# idea in combination form) fixes the key width: split the 64-bit
# fingerprint into 8 bands of 8 bits; ≤3 damaged bits touch ≤3 bands,
# so ≥5 bands are intact and the pair agrees on the exact 5-subset of
# intact bands — enumerate all C(8,5)=56 subsets per doc as 40-bit
# keys. 2^40 key space ⇒ random collisions ~56·N²/2^41 ≈ 0 at any
# realistic N; rows are 56 slim (combo, key, doc) tuples per doc.
# Exactness is the same pigeonhole argument, just one level up.

SIMHASH_SUB_BANDS = 8
SIMHASH_SUB_BITS = N_SIMHASH_BITS // SIMHASH_SUB_BANDS
_SUB_MASK = (1 << SIMHASH_SUB_BITS) - 1
SIMHASH_SUBSET = 5  # bands per combo key (≥ bands − max_hamming wouldn't hold past 3)


def _band_subsets() -> list[tuple[int, ...]]:
    from itertools import combinations

    return list(combinations(range(SIMHASH_SUB_BANDS), SIMHASH_SUBSET))


def simhash_near_pairs(fp: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming via subset banding.

    Exact (pigeonhole over 8×8-bit bands, see scheme note above):
    every qualifying pair shares at least one full 40-bit combo key,
    so the equi-join on (combo, key) misses nothing; candidates then
    filter on true Hamming distance.
    """
    assert max_hamming <= SIMHASH_SUB_BANDS - SIMHASH_SUBSET, (
        "subset width must leave enough intact bands for the pigeonhole"
    )
    # One parsed SQL string for the 56-combo key array (the _dot_terms
    # rule, see simhash above): the Column-operator spelling cost
    # ~900 py4j round trips of pure build time per encounter.
    entries = ", ".join(
        "named_struct('cid', {cid}, 'key', CAST({terms} AS BIGINT))".format(
            cid=cid,
            terms=" + ".join(
                f"((shiftright(simhash, {b * SIMHASH_SUB_BITS}) & {_SUB_MASK})"
                f" * {1 << (SIMHASH_SUB_BITS * pos)}L)"
                for pos, b in enumerate(combo)
            ),
        )
        for cid, combo in enumerate(_band_subsets())
    )
    banded = (
        fp.select("doc_id", "simhash", F.expr(f"explode(array({entries}))").alias("e"))
        .select(
            "doc_id", "simhash", F.col("e.cid").alias("cid"), F.col("e.key").alias("key")
        )
        # no repartition pin: the fingerprint table under this explode
        # is persisted by the callers, so both self-join sides read the
        # cache; an explicit hash exchange here only added a wasted
        # shuffle on the broadcast path (see lsh_candidates)
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.cid") == F.col("r.cid"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.col("l.simhash").alias("fa"),
            F.col("r.simhash").alias("fb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return cand.select("a", "b", hamming.cast("bigint").alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def simhash_near_pairs_sql(max_hamming: int = 3) -> str:
    # The oracle can afford the O(n²) brute force — banding is exact,
    # so brute force over the same fingerprints yields identical pairs.
    return f"""
SELECT l.doc_id AS a, r.doc_id AS b,
       CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
FROM fp l JOIN fp r ON l.doc_id < r.doc_id
WHERE bit_count(xor(l.simhash, r.simhash)) <= {max_hamming}
"""


# --- exact similarity join via DF-capped inverted index ------------------

DF_CAP = 50  # prefix-filter: shingles in more docs than this don't key pairs
MIN_SHARED = 3  # count-filter: candidates must share >= this many rare shingles


def inverted_index_candidates(
    sh: DataFrame, df_cap: int = DF_CAP, min_shared: int = MIN_SHARED
) -> DataFrame:
    """Candidate pairs sharing ≥ ``min_shared`` LOW-frequency shingles.

    Two standard similarity-join guards compose here:
    - prefix filter (``df_cap``): a shingle appearing in thousands of
      docs would alone generate a quadratic pair blowup, so frequent
      shingles don't key pairs;
    - count filter (``min_shared``): random collisions overwhelmingly
      share one or two rare shingles, while true near-dups share many
      (j ≥ 0.5 with ≥10-token docs ⇒ ≥5 shared shingles), so the
      ``HAVING count ≥ 3`` drops most false candidates before the
      expensive full-set verification (measured 11× fewer candidates
      with zero lost survivors on the fixtures).

    Recall contract: misses only pairs whose shared shingles are all
    frequent, or that share a single rare shingle — both imply the
    overlap is either non-distinctive or tiny.

    Shuffle shape: the DF count is a COUNT window over one sh-keyed
    exchange, not a groupBy + join-back — the filtered rows keep their
    sh partitioning, so both self-join sides consume the same exchange
    (identical subtrees ⇒ ReuseExchange) and the whole candidate stage
    costs ONE shuffle of the shingle rows plus the pair aggregation.
    """
    from pyspark.sql.window import Window

    sh = sh.repartition("sh")
    rare = (
        sh.withColumn("df", F.count("*").over(Window.partitionBy("sh")))
        .where(F.col("df") <= df_cap)
        .drop("df")
    )
    l = rare.select(F.col("doc_id").alias("a"), "sh")
    r = rare.select(F.col("doc_id").alias("b"), "sh")
    return (
        l.join(r, ["sh"])
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
        .select("a", "b")
    )
