"""Training-data preparation queries: benchmark decontamination,
sequence packing, and quantile-based quality filtering.

These extend the corpus pipeline (plans/pipeline.py, plans/curation.py)
with the remaining operations a pretraining data pipeline runs between
"cleaned corpus" and "training batches":

- ``decontaminate`` — flag training documents that share a word 4-gram
  with an evaluation/benchmark set (the standard n-gram-overlap
  decontamination rule). The eval set here is a deterministic slice of
  the corpus (doc_id % 97 == 0) standing in for a benchmark suite.
- ``pack_sequences`` — GPT-style concat-and-chunk packing: documents
  are concatenated in doc_id order and sliced into fixed token-budget
  sequences; each document reports the sequence its first token lands
  in and its offset there. The running token total is a DISTRIBUTED
  prefix sum (operators/prefix.py) — no single-partition global window.
- ``quality_quantile_filter`` — drop the bottom quartile by token
  count, with the P25 threshold computed as an EXACT order statistic
  via a distinct-value histogram (scales because distinct token counts
  are bounded by max document length, not corpus size).

Tokenization matches the rest of the pipeline bit-for-bit: Spark
``word_split`` ≡ DuckDB ``list_filter(string_split_regex(text,
'[ \\t\\n\\x0b\\f\\r]+'), w -> w <> '')`` — the explicit class, since
RE2's ``\\s`` excludes ``\\x0b`` — and gram hashing rides the portable
``hash64`` (functions/hashing.py) so both engines agree on every key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storm_bench_spark.functions.hashing import hash64, hash64_sql
from storm_bench_spark.functions.text import bind, word_split
from storm_bench_spark.operators.prefix import exclusive_prefix_sum
from storm_bench_spark.plans.pipeline import _WORDS_SQL, _spread
from storm_bench_spark.plans.registry import register
from storm_bench_spark.sources.tables import load_table

_GRAM_N = 4
_EVAL_MOD = 97  # doc_id % 97 == 0 → "benchmark" slice
_SEQ_LEN = 512  # token budget per packed training sequence


def _gram_hashes(wv):
    """Array of hash64(word 4-gram) values; empty when < 4 tokens."""
    return F.when(
        F.size(wv) >= _GRAM_N,
        F.transform(
            F.sequence(F.lit(1), F.size(wv) - (_GRAM_N - 1)),
            lambda i: hash64(F.concat_ws(" ", F.slice(wv, i, _GRAM_N))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


_DECON_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
grams AS (
  SELECT doc_id, {hash64_sql("array_to_string(w[i:i+" + str(_GRAM_N - 1) + "], ' ')")} AS g
  FROM toks, UNNEST(range(1, len(w) - {_GRAM_N - 2})) AS t(i)
  WHERE len(w) >= {_GRAM_N}
),
evalg AS (SELECT DISTINCT g FROM grams WHERE doc_id % {_EVAL_MOD} = 0)
SELECT grams.doc_id, CAST(count(DISTINCT grams.g) AS BIGINT) AS n_hits
FROM grams JOIN evalg USING (g)
WHERE grams.doc_id % {_EVAL_MOD} <> 0
GROUP BY grams.doc_id
"""


@register("decontaminate", oracle=_DECON_ORACLE)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by word-4-gram overlap: a training doc
    is contaminated if any of its 4-grams appears in the eval slice.

    Scale shape: the eval/benchmark side is small by nature (benchmark
    suites are thousands of documents, not billions), so its DISTINCT
    gram-hash set builds with one keyed aggregate and BROADCASTS into
    the train-side probe — the 100-TB train grams never shuffle. Grams
    travel as hash64 BIGINTs (16× narrower than the gram strings), and
    the per-doc hit count is a map-side-combinable count distinct.
    """
    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir)
    # bind() the token array so the whitespace split runs once per row
    # — inside the transform lambda Spark applies no CSE, and an
    # unbound word_split would re-tokenize once per gram (quadratic in
    # document length; same fix as operators/dedup.shingle_arrays)
    grams = docs.select(
        "doc_id",
        F.explode(bind(word_split("text"), _gram_hashes)).alias("g"),
    )
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    eval_grams = grams.where(is_eval).select("g").distinct()
    return (
        grams.where(~is_eval)
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )


@register(
    "pack_sequences",
    oracle=f"""
WITH t AS (SELECT doc_id, len({_WORDS_SQL}) AS n_tokens FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(cum / {_SEQ_LEN}) AS BIGINT) AS seq_id,
       CAST(cum % {_SEQ_LEN} AS BIGINT) AS offset_in_seq
FROM c
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: concatenate documents in
    doc_id order, slice into 512-token sequences, report each
    document's landing sequence and offset.

    The running token total — the one inherently sequential step — is
    the two-phase distributed prefix sum (operators/prefix.py): keyed
    block aggregates + a bounded block-offset collect + parallel
    within-block windows. The oracle's single global window computes
    the same numbers; the Spark plan never funnels the corpus through
    one task, which is what makes this packing valid at 100 TB.
    """
    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir)
    tok = docs.select("doc_id", F.size(word_split("text")).alias("n_tokens"))
    cum = exclusive_prefix_sum(tok, "doc_id", "n_tokens", out_col="cum")
    return cum.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.floor(F.col("cum") / _SEQ_LEN).cast("bigint").alias("seq_id"),
        (F.col("cum") % _SEQ_LEN).cast("bigint").alias("offset_in_seq"),
    )


@register(
    "quality_quantile_filter",
    oracle=f"""
WITH t AS (SELECT doc_id, len({_WORDS_SQL}) AS n_tokens FROM documents),
k AS (SELECT CAST(ceil(0.25 * count(*)) AS BIGINT) AS k FROM t),
hist AS (SELECT n_tokens AS nt, count(*) AS c FROM t GROUP BY 1),
cum AS (SELECT nt, sum(c) OVER (ORDER BY nt) AS cm FROM hist),
thr AS (SELECT min(nt) AS thr FROM cum, k WHERE cm >= k.k)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
FROM t, thr
WHERE n_tokens >= thr.thr
""",
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop the bottom quartile by token count, thresholding at the
    EXACT P25 order statistic (k-th smallest, k = ceil(0.25·n); ties at
    the threshold are kept, so the cut is deterministic, not "exactly
    75%").

    The selection runs on a distinct-value histogram: one keyed
    aggregate collapses the corpus to (token_count, freq) rows — at
    most max-document-length distinct values regardless of corpus size
    — and BOTH the cumulative window and the rank k = ceil(0.25·n)
    derive from THAT table (n = Σ freq), so the corpus is tokenized
    once for the histogram and once for the final filter; the
    persisted per-doc token counts make each a cheap pass. The
    threshold then broadcasts into the filter. Swap the histogram for
    approx_percentile only if the score becomes continuous-valued.
    """
    from pyspark import StorageLevel

    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir)
    # consumed by the histogram build and the final filter — persist
    # so the regex tokenization runs once over the corpus
    tok = docs.select(
        "doc_id", F.size(word_split("text")).cast("bigint").alias("n_tokens")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    hist = tok.groupBy(F.col("n_tokens").alias("nt")).agg(F.count("*").alias("c"))
    cum = hist.withColumn(
        "cm", F.sum("c").over(Window.orderBy("nt").rowsBetween(Window.unboundedPreceding, 0))
    )
    # n = sum of histogram freqs: k computes from the tiny hist table,
    # not a third corpus pass
    k = hist.agg(F.ceil(F.lit(0.25) * F.sum("c")).alias("k"))
    thr = (
        cum.crossJoin(F.broadcast(k))
        .where(F.col("cm") >= F.col("k"))
        .agg(F.min("nt").alias("thr"))
    )
    return (
        tok.crossJoin(F.broadcast(thr))
        .where(F.col("n_tokens") >= F.col("thr"))
        .select("doc_id", "n_tokens")
    )


# --- the capstone composition: curate → decontaminate → pack -------------

def _corpus_build_oracle() -> str:
    from storm_bench_spark.plans.curation import CURATE_ORACLE

    return f"""
WITH kept AS (SELECT doc_id, n_tokens FROM ({CURATE_ORACLE})),
contam AS (SELECT doc_id FROM ({_DECON_ORACLE})),
clean AS (
  SELECT doc_id, n_tokens FROM kept
  WHERE doc_id % {_EVAL_MOD} <> 0
    AND doc_id NOT IN (SELECT doc_id FROM contam)
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM clean
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(cum / {_SEQ_LEN}) AS BIGINT) AS seq_id
FROM c
"""


@register("training_corpus_build", oracle=_corpus_build_oracle())
def training_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus pipeline as ONE query — what a
    user of this engine actually ships:

    1. curate: exact dedup → near-dup cluster keep-canonical → length
       floor (``corpus_curate``'s composition, reused);
    2. decontaminate: drop the benchmark slice AND every training doc
       sharing a 4-gram with it (anti-join against the broadcast-built
       hit list);
    3. pack: concat-and-chunk the survivors into 512-token training
       sequences via the distributed prefix sum (never one task).

    Every stage is the already-oracle-checked operator; the composed
    oracle replays the whole chain, so the green cell certifies the
    STAGE BOUNDARIES (which docs survive the joins, where the packing
    lands after the drops) — the part integration bugs live in. Scale
    shape: three keyed joins/aggregations plus the two-phase prefix
    sum; nothing funnels the corpus through a single task.
    """
    from storm_bench_spark.plans.curation import corpus_curate

    # Overlap the two independent legs (guide §2.6): corpus_curate's
    # connected-components loop is a sequence of small driver-
    # coordinated checkpoint jobs that leave most executor slots idle,
    # while decontaminate's gram explode + broadcast-hit-list build is
    # one fat, embarrassingly parallel job with no dependency on the
    # curate leg. A driver thread materializes the contamination list
    # (persisted; one bounded row per contaminated doc) into those
    # idle slots while the CC loop runs on the main thread — FIFO
    # scheduling back-fills exactly as §2.6 describes. Results are
    # unchanged: the same contam table feeds the same anti-join, it is
    # just computed earlier in wall time; the thread is joined before
    # the composed plan is returned, and a failure in either leg
    # propagates (fut.result() re-raises).
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import StorageLevel, inheritable_thread_target

    def _contam_build():
        c = decontaminate(spark, sf_dir).select("doc_id").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        spark.sparkContext.setJobDescription("training_corpus_build: decontaminate leg")
        c.count()  # materialize into the CC loop's idle executor slots
        return c

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(inheritable_thread_target(spark)(_contam_build))
        kept = corpus_curate(spark, sf_dir)
        contam = fut.result()
    clean = kept.where(F.col("doc_id") % _EVAL_MOD != 0).join(
        contam, "doc_id", "left_anti"
    )
    cum = exclusive_prefix_sum(
        clean.select("doc_id", "n_tokens"), "doc_id", "n_tokens", out_col="cum"
    )
    return cum.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.floor(F.col("cum") / _SEQ_LEN).cast("bigint").alias("seq_id"),
    )


# --- round-5 additions: shuffle / fuzzy decontamination / budget select --

_SHUFFLE_BUCKETS = 64  # training-shard count; cluster-scale = shard size knob
_SHUFFLE_EPOCH = 1  # fixed epoch salt (each epoch is a fresh permutation)


@register(
    "epoch_shuffle",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         {hash64_sql(f"concat(CAST(doc_id AS VARCHAR), ':', CAST({_SHUFFLE_EPOCH} AS VARCHAR))")} AS k
  FROM documents
)
SELECT CAST(k % {_SHUFFLE_BUCKETS} AS BIGINT) AS bucket,
       CAST(row_number() OVER (PARTITION BY k % {_SHUFFLE_BUCKETS}
                               ORDER BY k, doc_id) AS BIGINT) AS pos,
       doc_id
FROM keyed
""",
)
def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle for one epoch: every
    document gets a portable-hash key salted by the epoch number, lands
    in one of 64 shards (``bucket``), and takes its position within the
    shard from the key order — the reproducible corpus permutation a
    training run consumes (epoch 2 = change the salt, a fresh
    permutation, no data movement beyond the same one shuffle).

    This is THE scalable spelling of "shuffle 100 TB": no global sort,
    no single-partition funnel — one hash-partitioned exchange and a
    per-shard (windowed, partitionBy bucket) rank, each shard sorting
    ~1/64th of the corpus in parallel. Shard count is the scale knob:
    size it so a shard fits an executor's sort buffer. hash64 is
    md5-derived (functions/hashing.py), so engine and oracle agree on
    every key; pos ties break on doc_id (hash collisions).
    """
    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir)
    keyed = docs.select(
        "doc_id",
        hash64(
            F.concat_ws(":", F.col("doc_id").cast("string"),
                        F.lit(str(_SHUFFLE_EPOCH)))
        ).alias("k"),
    )
    w = Window.partitionBy(F.col("k") % _SHUFFLE_BUCKETS).orderBy("k", "doc_id")
    return keyed.select(
        (F.col("k") % _SHUFFLE_BUCKETS).cast("bigint").alias("bucket"),
        F.row_number().over(w).cast("bigint").alias("pos"),
        "doc_id",
    )


_BUDGET_DENOM = 4  # select the top-token quarter of the corpus budget
_ORD_SHIFT = 1 << 33  # doc_id < 2^33 (documented); n_tokens * 2^33 < 2^63


@register(
    "token_budget_select",
    oracle=f"""
WITH t AS (SELECT doc_id, CAST(len({_WORDS_SQL}) AS BIGINT) AS n_tokens FROM documents),
o AS (
  SELECT doc_id, n_tokens, doc_id - n_tokens * {_ORD_SHIFT} AS ord FROM t
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY ord
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM o
),
b AS (SELECT CAST(sum(n_tokens) / {_BUDGET_DENOM} AS BIGINT) AS budget FROM t)
SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum
FROM c, b
WHERE cum < b.budget
""",
)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy corpus selection under a token budget: rank documents
    longest-first (the ordering criterion is pluggable — any exact
    integer score works identically) and keep documents until the
    running total reaches 1/4 of the corpus' tokens. The last document
    whose PRECEDING total is under budget is kept whole — the
    concat-and-chunk packer downstream (``pack_sequences``) owns
    truncation.

    The ranking and the running total never funnel through one task:
    the (n_tokens DESC, doc_id) order is encoded as ONE integer key
    (``doc_id - n_tokens·2^33`` — exact while doc_id < 2^33 and
    n_tokens < 2^30, both corpus invariants the composite-key trick
    documents), so the cumulative sum is the distributed two-phase
    prefix sum (operators/prefix.py) over that key, and the budget is
    a broadcast one-row threshold — same shapes as
    ``quality_quantile_filter``.
    """
    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir)
    tok = docs.select(
        "doc_id", F.size(word_split("text")).cast("bigint").alias("n_tokens")
    ).withColumn("ord", F.col("doc_id") - F.col("n_tokens") * F.lit(_ORD_SHIFT))
    cum = exclusive_prefix_sum(tok, "ord", "n_tokens", out_col="cum")
    budget = tok.agg(
        (F.sum("n_tokens") / _BUDGET_DENOM).cast("bigint").alias("budget")
    )
    return (
        cum.crossJoin(F.broadcast(budget))
        .where(F.col("cum") < F.col("budget"))
        .select("doc_id", "n_tokens", F.col("cum").cast("bigint").alias("cum"))
    )


_FUZZY_DECON_T = 0.5  # near-dup Jaccard threshold vs the eval slice
# The fuzzy rule uses its own, larger benchmark slice (mod 13, ~7.7% of
# docs, vs the exact rule's mod 97): near-dup leakage is rarer than
# exact-gram leakage, and the mod-97 slice has ZERO near-dup partners at
# the driver's sf0.01 scale — a 0-row query verifies nothing. At mod 13
# the query returns real hits at every fixture scale (2 @ sf0.01,
# 36 @ sf0.1).
_FUZZY_EVAL_MOD = 13


def _fuzzy_decon_oracle() -> str:
    from storm_bench_spark.operators import dedup as DD

    return f"""
WITH sh AS ({DD.SHINGLES_SQL}),
sig AS ({DD.minhash_signature_sql()}),
bands AS ({DD.band_digests_sql()}),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.digest = r.digest
  WHERE l.doc_id % {_FUZZY_EVAL_MOD} <> 0 AND r.doc_id % {_FUZZY_EVAL_MOD} = 0
),
ver AS ({DD.verify_jaccard_sql('cand', _FUZZY_DECON_T)})
SELECT a AS doc_id, CAST(count(*) AS BIGINT) AS n_eval_matches,
       max(jaccard) AS max_jaccard
FROM ver GROUP BY a
"""


@register("decontaminate_minhash", oracle=_fuzzy_decon_oracle())
def decontaminate_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate benchmark decontamination: flag training docs
    whose shingle-set Jaccard vs ANY eval-slice doc is ≥ 0.5 — catches
    the paraphrased/reformatted eval leakage the exact-4-gram rule
    (``decontaminate``) misses. Same MinHash 32-perm / 8×4-band
    machinery as ``minhash_lsh``; candidates are (train, eval) band
    collisions instead of a self-join, so the (small, benchmark-sized)
    eval band table broadcasts into the train-side probe and the
    train corpus never shuffles for candidate generation. Exact
    Jaccard verify over the persisted shingle arrays; output is one
    row per contaminated train doc with its match count and worst
    (highest) overlap.
    """
    from pyspark import StorageLevel

    from storm_bench_spark.operators import dedup as DD

    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir)
    arr = DD.shingle_arrays(docs).persist(StorageLevel.MEMORY_AND_DISK)
    # repartitioned on the bucket key THEN persisted: the train filter
    # and the eval filter are two consumers of the same shingle→
    # signature→digest pipeline (uncached, each re-derives it from the
    # arr cache), and the repartition both dedups that work behind one
    # exchange and lands the train probe pre-partitioned on the join
    # key (measured: 2.05 s plain → 1.54 s repart+persist at sf0.1;
    # 8 small rows per doc, the cheap thing to keep). Signatures come
    # straight off the persisted arrays (minhash_signature_arrays) —
    # no explode→groupBy exchange before the banding.
    bands = (
        DD.band_digests(DD.minhash_signature_arrays(arr))
        .repartition("band", "digest")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    is_eval = F.col("doc_id") % _FUZZY_EVAL_MOD == 0
    train_b = bands.where(~is_eval).select(
        F.col("doc_id").alias("a"), "band", "digest"
    )
    eval_b = bands.where(is_eval).select(
        F.col("doc_id").alias("b"), "band", "digest"
    )
    cand = (
        train_b.join(F.broadcast(eval_b), ["band", "digest"])
        .select("a", "b")
        .distinct()
    )
    ver = DD.verify_jaccard_arrays(cand, arr, _FUZZY_DECON_T)
    return ver.groupBy(F.col("a").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )


# --- graded contamination scoring -----------------------------------------

_CONTAM_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
grams AS (
  SELECT DISTINCT doc_id, {hash64_sql("array_to_string(w[i:i+" + str(_GRAM_N - 1) + "], ' ')")} AS g
  FROM toks, UNNEST(range(1, len(w) - {_GRAM_N - 2})) AS t(i)
  WHERE len(w) >= {_GRAM_N}
),
evalg AS (SELECT DISTINCT g FROM grams WHERE doc_id % {_EVAL_MOD} = 0),
per AS (
  SELECT grams.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(coalesce(sum(CASE WHEN evalg.g IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hits
  FROM grams LEFT JOIN evalg ON grams.g = evalg.g
  WHERE grams.doc_id % {_EVAL_MOD} <> 0
  GROUP BY grams.doc_id
)
SELECT doc_id, n_grams, n_hits,
       CAST(n_hits AS DOUBLE) / CAST(n_grams AS DOUBLE) AS contamination
FROM per
"""


@register("contamination_score", oracle=_CONTAM_ORACLE)
def contamination_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded decontamination: instead of ``decontaminate``'s binary
    any-hit flag, score EVERY training document by the fraction of its
    distinct word-4-grams that appear in the eval slice — the signal a
    pipeline thresholds when it wants "drop verbatim leaks, keep docs
    that merely quote a benchmark question" (the usual policy knob).

    Scale shape: same as ``decontaminate`` — the benchmark gram set is
    small by nature and BROADCASTS into the train-side probe, so the
    100-TB gram stream never shuffles for the membership test; grams
    travel as hash64 BIGINTs. The per-doc distinct-gram set needs one
    keyed shuffle on (doc_id, g); the LEFT join against the broadcast
    set preserves misses so the ratio's denominator is the doc's full
    gram vocabulary and zero-hit docs score an exact 0.0. The ratio is
    an exact int/int IEEE division — bitwise replayable. Documents
    with < 4 tokens have no grams and no row (same rule as the oracle).
    """
    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir)
    grams = docs.select(
        "doc_id",
        F.explode(bind(word_split("text"), _gram_hashes)).alias("g"),
    ).distinct()
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    eval_grams = (
        grams.where(is_eval).select("g").distinct().withColumn("hit", F.lit(1))
    )
    per = (
        grams.where(~is_eval)
        .join(F.broadcast(eval_grams), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hits"),
        )
    )
    return per.select(
        "doc_id",
        "n_grams",
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_grams").cast("double")).alias(
            "contamination"
        ),
    )


# --- deterministic train/valid/test split --------------------------------

_SPLIT_CASE = (
    "CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'valid' ELSE 'test' END"
)


@register(
    "corpus_split",
    oracle=f"""
WITH tagged AS (
  SELECT lang,
         CAST(len({_WORDS_SQL}) AS BIGINT) AS nt,
         ({hash64_sql("concat('split:', CAST(doc_id AS VARCHAR))")}) % 100 AS b
  FROM documents
)
SELECT {_SPLIT_CASE} AS split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens
FROM tagged
GROUP BY 1, 2
""",
)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test split (90/5/5) with the per-split,
    per-language doc and token census a data card reports.

    Membership is ``hash64('split:' || doc_id) % 100`` — a pure,
    salted function of the document id, so (a) the assignment is
    reproducible across engines, retries, and re-runs (no ``rand()``,
    no state); (b) ANY future re-shard or re-partition of the corpus
    preserves it; (c) changing the salt re-draws the split without
    touching data. That is how production pipelines pin eval
    membership so training never silently absorbs the validation set.

    Shape at scale: one scan, no joins; tokenize once per row, hash
    once per row, then a map-side partially-aggregated groupBy whose
    shuffle carries |splits × languages| rows — single-digit — no
    matter the corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(b < 90, "train").when(b < 95, "valid").otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"),
            "lang",
            F.size(word_split("text")).cast("bigint").alias("nt"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
        )
    )
