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
    docs = _spread(load_table(spark, sf_dir, "documents"))
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
    docs = _spread(load_table(spark, sf_dir, "documents"))
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

    docs = _spread(load_table(spark, sf_dir, "documents"))
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

    kept = corpus_curate(spark, sf_dir)
    contam = decontaminate(spark, sf_dir).select("doc_id")
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
