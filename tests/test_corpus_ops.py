"""Property tests for the corpus/IR operators (plans/corpus_ops.py).

The SQL-oracle equality for every one of these runs in
test_correctness.py; these tests assert the SEMANTIC invariants the
oracle comparison can't express (dedup completeness, chunk lineage,
quantized-search recall, determinism under re-execution).
"""

from collections import Counter

from pyspark.sql import functions as F

from storm_bench_spark.plans.corpus_ops import (
    ANN_K,
    BM25_TOP,
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    DEDUP_BLOCK_TOKENS,
    ann_topk_quantized,
    bigram_lm_score,
    bm25_rank,
    chunk_dedup,
    chunk_documents,
    domain_mix_sample,
    embedding_quantize,
    inverted_index,
)
from storm_bench_spark.plans.dedup_queries import ann_topk
from storm_bench_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_chunk_documents_covers_every_token(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("w")
    )
    chunks = chunk_documents(spark, SF_DIR)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunks.collect()
    }
    for row in docs.collect():
        words = row["w"]
        starts = range(0, len(words), CHUNK_STRIDE)
        for cid, s in enumerate(starts):
            expect = words[s : s + CHUNK_TOKENS]
            text, n = got.pop((row["doc_id"], cid))
            assert text == " ".join(expect)
            assert n == len(expect)
    assert not got  # no extra chunks beyond the stride walk


def test_chunk_dedup_no_duplicate_blocks_survive(spark):
    out = chunk_dedup(spark, SF_DIR).collect()
    # every surviving block, across the whole corpus, is globally unique
    survivors = Counter()
    for r in out:
        words = r["clean_text"].split() if r["clean_text"] else []
        assert len(words) % 1 == 0
        kept = r["n_blocks"] - r["n_blocks_removed"]
        blocks = [
            " ".join(words[i : i + DEDUP_BLOCK_TOKENS])
            for i in range(0, len(words), DEDUP_BLOCK_TOKENS)
        ]
        # reassembly can merge a short tail block into the next doc's
        # arithmetic only if slicing were wrong; kept-count must bound it
        assert len(blocks) >= min(kept, 1)
        survivors.update(
            b for b in blocks if len(b.split()) == DEDUP_BLOCK_TOKENS
        )
    dupes = {b: c for b, c in survivors.items() if c > 1}
    assert not dupes, f"{len(dupes)} duplicated full blocks survive"
    # and the pass removed something on a corpus with planted dupes
    assert sum(r["n_blocks_removed"] for r in out) > 0


def test_domain_mix_rates_and_determinism(spark):
    a = domain_mix_sample(spark, SF_DIR)
    rows = a.collect()
    assert rows, "mixture sample is empty"
    for r in rows:
        assert 0 < r["rate_ppm"] <= 1_000_000
    # reproducible: hash-gated membership has no RNG
    b = sorted(map(tuple, domain_mix_sample(spark, SF_DIR).collect()))
    assert sorted(map(tuple, rows)) == b


def test_embedding_quantize_bounds(spark):
    for r in embedding_quantize(spark, SF_DIR).collect():
        qs = [int(x) for x in r["qvec_csv"].split(",")]
        assert all(-127 <= q <= 127 for q in qs)
        assert max(abs(q) for q in qs) == 127 or r["scale"] == 0.0
        # reconstruction error is bounded by half a quantization step
        # (+5e-7: max_abs_err is emitted rounded to 6 decimals, which
        # can round up past the exact bound)
        assert r["max_abs_err"] <= r["scale"] / 2 + 5e-7


def test_ann_topk_quantized_recall_vs_exact(spark):
    exact = {
        (r["qid"], r["neighbor"]) for r in ann_topk(spark, SF_DIR).collect()
    }
    quant = {
        (r["qid"], r["neighbor"])
        for r in ann_topk_quantized(spark, SF_DIR).collect()
    }
    recall = len(exact & quant) / len(exact)
    # int8 quantization barely perturbs cosine ranks
    assert recall >= 0.8, f"quantized recall {recall:.2f}"
    assert len(quant) == len(exact) == ANN_K * 10


def test_ann_rerank_refines_the_quantized_shortlist(spark):
    from storm_bench_spark.operators import similarity as SIM
    from storm_bench_spark.plans.corpus_ops import (
        EMB_DIM,
        SHORTLIST_K,
        _quantized,
        ann_rerank,
    )
    from pyspark.sql import functions as F

    q = _quantized(load_table(spark, SF_DIR, "embeddings")).select(
        "vec_id", F.col("qarr").cast("array<double>").alias("qv")
    )
    shortlist = {
        (r["qid"], r["neighbor"])
        for r in SIM.ann_topk_bruteforce(
            q, q.where(F.col("vec_id") < 10), SHORTLIST_K, vec_col="qv", dim=EMB_DIM
        ).collect()
    }
    rer = ann_rerank(spark, SF_DIR).collect()
    assert len(rer) == ANN_K * 10
    by_q = {}
    for r in rer:
        # stage-2 candidates come from the stage-1 shortlist only
        assert (r["qid"], r["neighbor"]) in shortlist
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, ANN_K + 1))
        # the emitted rank order IS the exact-cosine order
        assert all(a["cos"] >= b["cos"] for a, b in zip(rows, rows[1:]))
    # two-stage recall vs exact brute force is at least quantized-only
    # recall (re-ranking can only fix orderings inside the shortlist)
    exact = {(r["qid"], r["neighbor"]) for r in ann_topk(spark, SF_DIR).collect()}
    quant = {
        (r["qid"], r["neighbor"]) for r in ann_topk_quantized(spark, SF_DIR).collect()
    }
    rr = {(r["qid"], r["neighbor"]) for r in rer}
    assert len(exact & rr) >= len(exact & quant)


def test_bm25_rank_is_ordered_and_positive(spark):
    rows = bm25_rank(spark, SF_DIR).collect()
    assert [r["rank"] for r in rows] == list(range(1, BM25_TOP + 1))
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > 0


def test_bigram_lm_score_range(spark):
    rows = bigram_lm_score(spark, SF_DIR).collect()
    assert len(rows) == load_table(spark, SF_DIR, "documents").count()
    for r in rows:
        if r["n_bigrams"] > 0:
            assert 0 < r["mean_prob_ppm"] <= 1_000_000
        else:
            assert r["mean_prob_ppm"] == 0


def test_inverted_index_postings_sorted(spark):
    for r in inverted_index(spark, SF_DIR).collect():
        ids = [int(x) for x in r["postings"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) <= 20
        assert r["df"] >= 5 and r["cf"] >= r["df"]


def test_textrank_ranks_hub_words(spark):
    from storm_bench_spark.plans.corpus_ops import TR_SCALE, TR_TOP, textrank_keywords

    rows = textrank_keywords(spark, SF_DIR).collect()
    assert [r["rank"] for r in rows] == list(range(1, TR_TOP + 1))
    scores = [r["score_scaled"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # damped PageRank over a connected-ish graph keeps ranks near the
    # 1.0 fixed point; top words must sit above the uniform score
    assert scores[0] > TR_SCALE
    # the top keywords should be corpus hub words (high-df terms)
    top_words = {r["word"] for r in rows[:10]}
    hubs = {"join", "hash", "row", "scan", "table", "batch", "column", "filter"}
    assert top_words & hubs, f"no hub word in top-10: {sorted(top_words)}"


def test_cms_overestimates_and_misses_nothing(spark):
    from storm_bench_spark.plans.corpus_ops import CMS_MIN_EST, heavy_hitters_cms

    est = {r["term"]: r["est_cnt"] for r in heavy_hitters_cms(spark, SF_DIR).collect()}
    true_counts = {
        r["term"]: r["cnt"]
        for r in load_table(spark, SF_DIR, "documents")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    # CMS property 1: estimates never undercount
    for term, e in est.items():
        assert e >= true_counts[term], (term, e, true_counts[term])
    # CMS property 2: no false negatives — every truly-frequent term
    # is reported (its estimate is >= its true count >= threshold)
    for term, c in true_counts.items():
        if c >= CMS_MIN_EST:
            assert term in est, f"missed heavy hitter {term} ({c})"


def test_domain_mix_zero_token_source_keeps_everything(spark, tmp_path):
    """A source whose documents all tokenize empty must take rate 10^6
    (keep all — zero token mass costs nothing against the budget)
    instead of dividing by zero (ANSI crash) or diverging from the
    oracle."""
    import duckdb

    from storm_bench_spark.plans.registry import get_spec
    from tests.oracle_utils import assert_frames_match

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta", "en", "full_src", 22),
            (1, "beta gamma delta alpha", "en", "full_src", 22),
            (2, "   ", "en", "empty_src", 3),
            (3, "", "en", "empty_src", 0),
        ],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    spec = get_spec("domain_mix_sample")
    out = spec.fn(spark, sf).toPandas()
    con = duckdb.connect()
    # Spark writes the table as a directory of part files
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    assert_frames_match(out, con.execute(spec.oracle).fetchdf(), "domain_mix_zero")
    by_src = dict(zip(out["doc_id"], out["rate_ppm"]))
    # empty-source docs that pass the hash gate carry rate 10^6
    for doc_id, rate in by_src.items():
        if doc_id in (2, 3):
            assert rate == 1_000_000


def test_chunk_dedup_first_occurrence_rule_brute_force(spark, tmp_path):
    # Round 11 (window-min respell): pin the FIRST-OCCURRENCE-WINS rule
    # itself — which occurrence survives, by packed (doc_id, position)
    # order — against a pure-Python replay on a crafted corpus with
    # cross-doc repeats, within-doc repeats, a ragged tail, and a
    # fully-duplicated document. The sf-fixture test above only checks
    # survivor uniqueness; this one checks WHO survived.
    B = DEDUP_BLOCK_TOKENS

    def block(tag):  # one full 16-word block of distinct words
        return [f"{tag}w{i}" for i in range(B)]

    docs = {
        # doc 0: A B A  (within-doc repeat of A -> second A removed)
        0: block("a") + block("b") + block("a"),
        # doc 1: B C  (B already owned by doc 0 -> removed here)
        1: block("b") + block("c"),
        # doc 2: A B  (both owned earlier -> clean_text empty)
        2: block("a") + block("b"),
        # doc 3: D + ragged 5-word tail (tail is its own block, unique)
        3: block("d") + ["tail0", "tail1", "tail2", "tail3", "tail4"],
    }
    rows = [(i, " ".join(w), "en", "test", len(" ".join(w))) for i, w in docs.items()]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    # pure-Python replay of the rule
    owner: dict[str, tuple] = {}
    expected = {}
    for did in sorted(docs):
        w = docs[did]
        cids = list(range((len(w) + B - 1) // B))
        keep = []
        removed = 0
        for c in cids:
            btxt = " ".join(w[c * B : (c + 1) * B])
            pos = (did, c)
            if btxt not in owner:
                owner[btxt] = pos
            if owner[btxt] == pos:
                keep.append(btxt)
            else:
                removed += 1
        expected[did] = (len(cids), removed, " ".join(keep))

    got = {
        r["doc_id"]: (r["n_blocks"], r["n_blocks_removed"], r["clean_text"])
        for r in chunk_dedup(spark, str(tmp_path)).collect()
    }
    assert got == expected
