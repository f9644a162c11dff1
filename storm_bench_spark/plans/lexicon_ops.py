"""Tokenizer-prep & data-selection operators (round 5, tail).

Four capabilities a pretraining data platform needs between "cleaned
corpus" and "tokenized batches", closing the remaining tokenizer-side
gap in the LLM-pipeline surface:

- ``boilerplate_ngram_ratio`` — the C4/RefinedWeb duplicated-n-gram
  quality signal: per document, the fraction of its word 3-grams that
  occur in >= MIN_DOCS distinct documents corpus-wide.
- ``vocab_oov_rate``   — frequency-ranked vocabulary build (top-V) and
  per-document out-of-vocabulary rate against it (the tokenizer
  coverage check run before committing to a vocab).
- ``dsir_select``      — DSIR-shaped data selection (Xie et al. 2023,
  "Data Selection for Language Models via Importance Resampling"):
  hashed-bigram importance ratios between a target domain (lang='en')
  and the raw corpus, scored over the non-target pool, top-K selected.
- ``bpe_merge_steps``  — the first BPE_STEPS merge iterations of BPE
  tokenizer training (Sennrich et al. 2016) over the corpus
  word-frequency table, returning each learned merge and its count.

FP discipline (same rules as plans/corpus_ops.py): every cross-engine
number is exact integer arithmetic — counts, fixed-point ppm via
integer division, md5-derived hash buckets. Where the textbook formula
wants a log (DSIR's log-likelihood ratio), the implementation uses an
order-preserving integer-quantized rational form and documents the
substitution; no float ever accumulates across rows.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storm_bench_spark.functions.hashing import hash64, hash64_sql
from storm_bench_spark.functions.text import word_split
from storm_bench_spark.plans.corpus_ops import _bigram_pairs, _topk_ranked
from storm_bench_spark.plans.pipeline import _WORDS_SQL, _spread
from storm_bench_spark.plans.registry import register
from storm_bench_spark.sources.tables import load_table

NGRAM_N = 3        # boilerplate n-gram order
MIN_DOCS = 3       # a 3-gram in >= MIN_DOCS distinct docs is "boilerplate"
VOCAB_TOP = 20     # vocabulary size for the OOV check
DSIR_FEATURES = 4096
DSIR_TARGET_LANG = "en"
DSIR_TOP = 100
BPE_STEPS = 4


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(load_table(spark, sf_dir, "documents"), sf_dir)


def _trigram_hash_expr():
    """Word-3-gram ``hash64`` values of the bound token array ``w`` as
    one array<bigint> per doc (empty for <3-word docs) — the gram
    string never materializes outside the transform lambda, so the
    per-doc cache holds 8 B/position instead of the gram text."""
    # hash64's md5 spelling (functions/hashing.py:43) inlined into the
    # lambda so the whole position -> hash pipeline is one HOF pass
    gram = "concat_ws(' ', w[i - 1], w[i], w[i + 1])"
    body = (
        "transform(sequence(1, size(w) - 2), "
        f"i -> CAST(conv(substr(md5({gram}), 1, 15), 16, 10) AS BIGINT))"
    )
    return F.expr(
        f"CASE WHEN size(w) >= {NGRAM_N} THEN {body} "
        "ELSE CAST(array() AS array<bigint>) END"
    )


# --- C4-style duplicated-n-gram quality signal ---------------------------

@register(
    "boilerplate_ngram_ratio",
    oracle=f"""
WITH words AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
tri AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS g
  FROM (SELECT doc_id, w, unnest(range(1, greatest(len(w) - 1, 1))) AS i
        FROM words)
),
trih AS (SELECT doc_id, {hash64_sql('g')} AS gh FROM tri),
freq AS (
  SELECT gh FROM (SELECT gh, count(DISTINCT doc_id) AS df
                  FROM trih GROUP BY gh)
  WHERE df >= {MIN_DOCS}
),
hits AS (SELECT doc_id, count(*) AS n_frequent
         FROM trih JOIN freq USING (gh) GROUP BY doc_id),
tot AS (SELECT doc_id, greatest(len(w) - {NGRAM_N - 1}, 0) AS n_grams
        FROM words)
SELECT t.doc_id,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(coalesce(n_frequent, 0) AS BIGINT) AS n_frequent,
       CAST(CASE WHEN n_grams > 0
                 THEN coalesce(n_frequent, 0) * 1000000 // n_grams
                 ELSE 0 END AS BIGINT) AS boilerplate_ppm
FROM tot t LEFT JOIN hits USING (doc_id)
""",
)
def boilerplate_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-3-gram fraction — the C4/RefinedWeb
    boilerplate signal: a 3-gram is "frequent" if it appears in
    >= MIN_DOCS distinct documents, and a document's boilerplate ratio
    is (frequent-3-gram positions / total 3-gram positions) in ppm.

    Shape at scale: 3-grams shuffle as 64-bit hashes (never strings);
    the exploded gram table is persisted because it feeds both the
    document-frequency build and the probe; the frequent-gram set is
    boilerplate-sized (<< corpus), so the closing equi-join's build
    side is small — AQE picks broadcast when it fits, a shuffled hash
    join when a pathological corpus makes it large. Exact
    count(DISTINCT doc_id) is a two-phase hash aggregate with map-side
    partials; the per-doc ratio is exact integer fixed-point.

    Round 10 restructure (VERDICT r9 next #1b — the stage profile):
    the corpus text was being SPLIT TWICE (the per-doc gram total
    re-derived ``words`` from raw), and the per-doc hit count joined
    back to the total in a closing doc-keyed join. ``explode_outer``
    keeps a NULL-gram row for <3-word docs, so ONE grouped pass over
    the marker-joined gram table yields both n_grams and n_frequent —
    one split, one doc-keyed shuffle, no closing join.

    Round 12 respell (VERDICT r11 next #1 — the last row above the 2x
    tier bar): the r10 spelling persisted raw gram POSITIONS and its
    countDistinct DF build shuffled every distinct (gh, doc_id) pair —
    the row's only big exchange. Hashing the trigrams IN-ARRAY (the
    ``hash64`` md5 spelling inlined into the trigram transform lambda)
    removes it entirely: the persisted table is one array<bigint> of
    position hashes per doc (8 B/position — half the exploded row
    form), the DF build explodes ``array_distinct(h)`` so the
    per-doc dedup happens inside the array (no (gh, doc)-keyed
    exchange at all — the groupBy(gh).count() ships only map-side
    partial counts, ≤ #partitions rows for even a corpus-constant
    Zipf gram), and the probe explodes the cached arrays into the
    boilerplate-sized broadcast join + doc-keyed count. NOTHING
    position-sized crosses an exchange anywhere in the plan — the
    window-funnel respell r11 declined stays declined. The in-lambda
    md5 runs on Catalyst's interpreted HOF path, but md5 itself
    dominates the eval cost (measured: 1.34 s vs 1.59 s for the
    exploded-codegen spelling at the sf1 tier, min-of-8).
    Bit-identical to the r10 spelling (exceptAll both ways = 0,
    BASELINE.md round 12); oracle unchanged.
    """
    words = _docs(spark, sf_dir).select("doc_id", word_split("text").alias("w"))
    tga = words.select("doc_id", _trigram_hash_expr().alias("h")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    freq = (
        tga.select(F.explode(F.array_distinct("h")).alias("gh"))
        .groupBy("gh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= MIN_DOCS)
        .select("gh", F.lit(1).alias("_f"))
    )
    # explode_outer keeps a NULL-gh placeholder row for <3-word docs
    # (empty hash array); NULL never equi-joins, so the row survives
    # the left join unmarked — count("gh") skips it (n_grams = 0) and
    # the doc stays in the output
    probe = tga.select("doc_id", F.explode_outer("h").alias("gh"))
    return (
        probe.join(freq, "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("gh").alias("n_grams"),
            F.count("_f").alias("n_frequent"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.col("n_frequent").cast("bigint").alias("n_frequent"),
            F.when(
                F.col("n_grams") > 0,
                F.expr("n_frequent * 1000000 div n_grams"),
            ).otherwise(F.lit(0)).cast("bigint").alias("boilerplate_ppm"),
        )
    )


# --- vocabulary build + OOV-rate check -----------------------------------

@register(
    "vocab_oov_rate",
    oracle=f"""
WITH words AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS word FROM words),
counts AS (SELECT word, count(*) AS c FROM tok GROUP BY word),
vocab AS (SELECT word FROM counts ORDER BY c DESC, word ASC LIMIT {VOCAB_TOP}),
pd AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM tok t LEFT JOIN vocab v ON t.word = v.word
  GROUP BY t.doc_id
)
SELECT w.doc_id,
       CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
       CAST(coalesce(n_oov * 1000000 // n_tokens, 0) AS BIGINT) AS oov_ppm
FROM words w LEFT JOIN pd ON w.doc_id = pd.doc_id
""",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-V frequency vocabulary and per-document OOV rate against it
    — the coverage check run before freezing a tokenizer vocab.
    Deterministic vocab boundary: rank by (count DESC, word ASC), so a
    count tie at rank V resolves identically in both engines.

    Shape at scale: one map-side-combined token count (vocabulary-sized
    output), a TakeOrdered top-V (per-partition heaps, no global sort),
    and an explicitly broadcast V-row vocab joined back to the token
    stream — the token table shuffles once for the per-doc aggregate
    and never for the vocab probe. Docs below the token explode (empty
    text) re-enter via the left join with zero counts.
    """
    words = _docs(spark, sf_dir).select("doc_id", word_split("text").alias("w"))
    tok = words.select("doc_id", F.explode("w").alias("word")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    counts = tok.groupBy("word").agg(F.count("*").alias("c"))
    vocab = (
        counts.orderBy(F.desc("c"), F.asc("word"))
        .limit(VOCAB_TOP)
        .select("word", F.lit(1).alias("iv"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("iv").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return words.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0)).cast("bigint").alias("n_oov"),
        F.coalesce(F.expr("n_oov * 1000000 div n_tokens"), F.lit(0))
        .cast("bigint")
        .alias("oov_ppm"),
    )


# --- DSIR-shaped importance selection ------------------------------------

@register(
    "dsir_select",
    oracle=f"""
WITH words AS (SELECT doc_id, lang, {_WORDS_SQL} AS w FROM documents),
bi AS (
  SELECT doc_id, lang,
         {hash64_sql("w[i] || ' ' || w[i + 1]")} % {DSIR_FEATURES} AS f
  FROM (SELECT doc_id, lang, w, unnest(range(1, greatest(len(w), 1))) AS i
        FROM words)
),
raw AS (SELECT f, count(*) AS cr FROM bi GROUP BY f),
tgt AS (SELECT f, count(*) AS ct FROM bi
        WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY f),
ratio AS (
  SELECT f, (coalesce(ct, 0) + 1) * 1000000 // (cr + 1) AS r
  FROM raw LEFT JOIN tgt USING (f)
),
scores AS (
  SELECT doc_id, sum(r) // count(*) AS importance_ppm
  FROM bi JOIN ratio USING (f)
  WHERE lang <> '{DSIR_TARGET_LANG}'
  GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY importance_ppm DESC, doc_id ASC)
            AS BIGINT) AS rank,
       doc_id,
       CAST(importance_ppm AS BIGINT) AS importance_ppm
FROM scores ORDER BY importance_ppm DESC, doc_id ASC LIMIT {DSIR_TOP}
""",
)
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-shaped data selection: score every NON-target document by
    how target-like its hashed-bigram feature distribution is, select
    the top-K. Target = lang='en'; features = hashed word bigrams into
    DSIR_FEATURES buckets (the paper's hashed-n-gram feature space).

    Integer-quantized importance (documented substitution): DSIR's
    per-feature log-likelihood-ratio ``ln(p_t(f)/p_r(f))`` becomes the
    add-one-smoothed integer ratio ``(c_t(f)+1)*10^6 // (c_r(f)+1)``
    and a document's score the exact integer mean over its feature
    occurrences — order-preserving per feature, bit-identical across
    engines (``ln`` is libm-dependent; a float Σ would be
    aggregation-order-dependent). Documents with <2 words have no
    bigrams and are not candidates (both engines agree by
    construction).

    Shape at scale: the hashed-feature stream is persisted (feeds the
    raw count, the target count, and the probe); both count tables and
    the ratio table are DSIR_FEATURES-sized (4096 rows) — the ratio is
    explicitly broadcast to the probe so the corpus-sized stream never
    shuffles for the score join, only for the per-doc aggregate; the
    final top-K is TakeOrdered (per-partition heaps + K-row driver
    merge), with the rank window over the K survivors only.
    """
    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", word_split("text").alias("w")
    )
    bi = (
        docs.select("doc_id", "lang", F.explode(_bigram_pairs()).alias("b"))
        .select(
            "doc_id",
            "lang",
            (hash64(F.concat_ws(" ", "b.w1", "b.w2")) % F.lit(DSIR_FEATURES)).alias("f"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # raw and target feature counts in ONE grouped pass (round 10): a
    # conditional count replaces the separate target aggregate and the
    # f-keyed left join — one shuffle over the feature stream instead
    # of two, same integers (a feature with no target rows counts 0)
    ratio = (
        bi.groupBy("f")
        .agg(
            F.count("*").alias("cr"),
            F.count(F.when(F.col("lang") == DSIR_TARGET_LANG, 1)).alias("ct"),
        )
        .select("f", F.expr("(ct + 1) * 1000000 div (cr + 1)").alias("r"))
    )
    scores = (
        bi.filter(F.col("lang") != DSIR_TARGET_LANG)
        .join(F.broadcast(ratio), "f")
        .groupBy("doc_id")
        .agg(F.expr("sum(r) div count(*)").alias("importance_ppm"))
    )
    top = _topk_ranked(scores, DSIR_TOP, "importance_ppm", "doc_id")
    return top.select(
        "rank", "doc_id", F.col("importance_ppm").cast("bigint").alias("importance_ppm")
    )


# --- BPE merge training steps --------------------------------------------

def _bpe_oracle(steps: int) -> str:
    """Unrolled DuckDB replay of the BPE training loop: each step
    extracts weighted adjacent symbol pairs from the piped word
    representation, picks the (count DESC, pair ASC) argmax, and
    applies the merge via non-overlapping left-to-right replace —
    byte-identical to the Spark/driver loop.

    Representation: every symbol carries its OWN delimiters
    (``'abc' -> '|a||b||c|'``), so adjacent pattern occurrences never
    share a boundary character and one left-to-right literal replace
    of ``|l||r|`` with ``|lr|`` is EXACTLY the greedy merge — including
    back-to-back repeats ('papa' with (p,a), same-symbol runs 'aaaa'
    with (a,a)), which the earlier shared-pipe form ``|a|b|c|`` merged
    only once because each match consumed the next match's leading
    pipe."""
    blocks, outs = _bpe_blocks(steps, carry_word=False)
    return "WITH " + ",\n".join(blocks) + "\n" + "\nUNION ALL\n".join(outs)


def _bpe_blocks(steps: int, carry_word: bool) -> tuple[list[str], list[str]]:
    """The unrolled training chain as CTE blocks. ``carry_word`` keeps
    the word column through every merge step so an APPLY stage can map
    each vocabulary word to its final symbol sequence (the pair-count
    and argmax sub-selects only ever read (rep, freq), so the carried
    column cannot change any learned merge)."""
    wcol = "word, " if carry_word else ""
    blocks = [
        f"wf AS (SELECT word, count(*) AS freq FROM "
        f"(SELECT unnest({_WORDS_SQL}) AS word FROM documents) GROUP BY word)",
        f"w0 AS (SELECT {wcol}regexp_replace(word, '(.)', '|\\1|', 'g') AS rep, "
        "freq FROM wf)",
    ]
    outs = []
    for s in range(1, steps + 1):
        p = s - 1
        blocks.append(f"""p{s} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r, sum(freq) AS cnt
  FROM (SELECT syms, freq, unnest(range(1, greatest(len(syms), 1))) AS i
        FROM (SELECT list_filter(string_split(rep, '|'), x -> x <> '') AS syms,
                     freq FROM w{p}))
  GROUP BY l, r)""")
        blocks.append(
            f"b{s} AS (SELECT l, r, cnt FROM p{s} "
            f"ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)"
        )
        blocks.append(f"""w{s} AS (
  SELECT {wcol}replace(rep,
                 '|' || (SELECT l FROM b{s}) || '||' || (SELECT r FROM b{s}) || '|',
                 '|' || (SELECT l FROM b{s}) || (SELECT r FROM b{s}) || '|') AS rep,
         freq FROM w{p})""")
        outs.append(
            f"SELECT CAST({s} AS BIGINT) AS step, l AS left_sym, r AS right_sym, "
            f"CAST(cnt AS BIGINT) AS pair_count FROM b{s}"
        )
    return blocks, outs


def _bpe_encode_oracle(steps: int) -> str:
    """Train (same chain as :func:`_bpe_oracle`, word carried through)
    then APPLY: token count per vocabulary word from its final piped
    representation, joined back to the corpus word stream and summed
    per document."""
    blocks, _ = _bpe_blocks(steps, carry_word=True)
    chain = ",\n".join(blocks)
    return f"""
WITH {chain},
tok AS (
  SELECT word,
         len(list_filter(string_split(rep, '|'), x -> x <> '')) AS t
  FROM w{steps}
),
dw AS (
  SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents
)
SELECT dw.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(length(dw.word)) AS BIGINT) AS n_chars,
       CAST(sum(tok.t) AS BIGINT) AS n_tokens,
       CAST(sum(tok.t) * 1000000 // sum(length(dw.word)) AS BIGINT)
         AS tokens_per_char_ppm
FROM dw JOIN tok ON dw.word = tok.word
GROUP BY dw.doc_id
"""


_BPE_PAIRS_EXPR = (
    "CASE WHEN size(syms) >= 2 THEN "
    "transform(sequence(1, size(syms) - 1), "
    "i -> struct(syms[i - 1] AS l, syms[i] AS r)) "
    "ELSE CAST(array() AS array<struct<l: string, r: string>>) END"
)


@register("bpe_merge_steps", oracle=_bpe_oracle(BPE_STEPS))
def bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE_STEPS merges of BPE tokenizer training (Sennrich et
    al. 2016): words become symbol sequences where every symbol
    carries its own delimiters (``'the' -> '|t||h||e|'``), each step
    counts adjacent symbol pairs weighted by word frequency (every
    adjacent position counts, including overlaps within a run — the
    reference get_stats convention), learns the (count DESC, then
    lexicographic) argmax pair, and merges it greedily left-to-right:
    because adjacent occurrences of ``|l||r|`` occupy disjoint
    character ranges (no shared boundary pipe), one non-overlapping
    left-to-right literal ``replace`` IS the greedy merge — including
    back-to-back repeats ('papa' merging (p,a) twice) and same-symbol
    runs ('aaaa' -> 'aa','aa'), the cases the earlier shared-pipe
    representation got wrong (each match consumed the pipe the next
    match needed). Symbols never contain '|', and a merged symbol
    ``|lr|`` has no interior '||', so a replace can neither split a
    symbol nor create a new occurrence.

    Shape at scale — the real BPE trainer shape: ONE corpus-scale pass
    builds the word-frequency table (map-side-combined count,
    vocabulary-sized result, persisted); every iteration after that
    runs on the vocabulary-sized table, and the driver collects exactly
    one argmax row per step (bounded by construction: BPE_STEPS rows
    total) to literalize the next merge — the same driver-coordinated
    iteration pattern as the k-means Lloyd loop. The returned frame is
    the collected merge log (BPE_STEPS rows, LocalTableScan).
    """
    docs = _docs(spark, sf_dir)
    wf = (
        docs.select(F.explode(word_split("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select(
            F.regexp_replace("word", "(.)", "|$1|").alias("rep"),
            "freq",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    merges, _ = _bpe_train(wf, BPE_STEPS)
    return spark.createDataFrame(
        merges, schema="step bigint, left_sym string, right_sym string, pair_count bigint"
    )


def _bpe_train(cur: DataFrame, steps: int):
    """The driver-coordinated merge loop over a (..., rep, freq) frame
    (shared by training-only ``bpe_merge_steps`` and train-then-apply
    ``bpe_encode``): per step, weighted adjacent-pair counts →
    (count DESC, pair ASC) argmax collected to the driver (exactly one
    row per step, bounded by ``steps``) → literal left-to-right
    replace. Extra columns (e.g. the vocabulary word) pass through the
    merges untouched — the pair-count stage reads only (rep, freq).
    Returns ``(merge log, frame after all merges)``.
    """
    merges = []
    for step in range(1, steps + 1):
        pairs = (
            cur.select(
                "freq",
                F.expr("filter(split(rep, '\\\\|'), x -> x <> '')").alias("syms"),
            )
            .select("freq", F.explode(F.expr(_BPE_PAIRS_EXPR)).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1).collect()[0]
        merges.append((step, best["l"], best["r"], int(best["cnt"])))
        cur = cur.withColumn(
            "rep",
            F.call_function(
                "replace",
                F.col("rep"),
                F.lit(f"|{best['l']}||{best['r']}|"),
                F.lit(f"|{best['l']}{best['r']}|"),
            ),
        )
    return merges, cur


@register("bpe_encode", oracle=_bpe_encode_oracle(BPE_STEPS))
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY — the stage after ``bpe_merge_steps``'s train:
    encode every document under the BPE_STEPS-merge tokenizer and
    report per-document token statistics (word count, character
    count, post-merge token count, tokens-per-char compression as
    integer ppm).

    Shape at scale — the only tokenization shape that survives 100 TB:
    the merges are applied to the VOCABULARY (one literal replace per
    step over the persisted word-frequency table — vocabulary-sized
    work, not corpus-sized), and the corpus is touched exactly twice:
    once to build that vocabulary, once to join each word occurrence
    to its precomputed token count and sum per document. Per-token
    work never runs on the corpus stream, and nothing is per-row
    Python. Empty documents have no word rows and drop out (matching
    the oracle's unnest join).
    """
    docs = _docs(spark, sf_dir)
    dw = docs.select("doc_id", F.explode(word_split("text")).alias("word"))
    vocab = (
        dw.groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select(
            "word", F.regexp_replace("word", "(.)", "|$1|").alias("rep"), "freq"
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _, final = _bpe_train(vocab, BPE_STEPS)
    tok = final.select(
        "word",
        F.size(F.expr("filter(split(rep, '\\\\|'), x -> x <> '')")).alias("t"),
    )
    return (
        dw.join(tok, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            F.sum("t").cast("bigint").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_chars",
            "n_tokens",
            F.expr("n_tokens * 1000000 div n_chars")
            .cast("bigint")
            .alias("tokens_per_char_ppm"),
        )
    )
