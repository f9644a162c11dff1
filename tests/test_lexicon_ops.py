"""Semantic invariants for the tokenizer-prep / data-selection
operators (plans/lexicon_ops.py). SQL-oracle equality runs in
test_correctness.py; these tests replay each operator's full semantics
in pure Python at sf0.001 and compare exactly — an engine-independent
third opinion (the DuckDB oracle shares the SQL dialect family; a
Python replay shares nothing)."""

import hashlib
import re
from collections import Counter

from storm_bench_spark.plans.lexicon_ops import (
    BPE_STEPS,
    DSIR_FEATURES,
    DSIR_TARGET_LANG,
    DSIR_TOP,
    MIN_DOCS,
    VOCAB_TOP,
    boilerplate_ngram_ratio,
    bpe_merge_steps,
    dsir_select,
    vocab_oov_rate,
)
from storm_bench_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _doc_words(spark):
    rows = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    return [(r["doc_id"], r["lang"], [w for w in re.split(r"\s+", r["text"]) if w])
            for r in rows]


def _hash64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_boilerplate_ratio_matches_python_replay(spark):
    docs = _doc_words(spark)
    grams = {}  # gram -> set(doc_id)
    per_doc = {}
    for doc_id, _, w in docs:
        gs = [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]
        per_doc[doc_id] = gs
        for g in gs:
            grams.setdefault(g, set()).add(doc_id)
    frequent = {g for g, d in grams.items() if len(d) >= MIN_DOCS}
    got = {r["doc_id"]: r for r in boilerplate_ngram_ratio(spark, SF_DIR).collect()}
    assert set(got) == {d for d, _, _ in docs}
    for doc_id, _, w in docs:
        gs = per_doc[doc_id]
        nf = sum(1 for g in gs if g in frequent)
        r = got[doc_id]
        assert r["n_grams"] == len(gs)
        assert r["n_frequent"] == nf
        assert r["boilerplate_ppm"] == (nf * 1_000_000 // len(gs) if gs else 0)


def test_vocab_oov_matches_python_replay(spark):
    docs = _doc_words(spark)
    counts = Counter(w for _, _, ws in docs for w in ws)
    vocab = {w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_TOP]}
    got = {r["doc_id"]: r for r in vocab_oov_rate(spark, SF_DIR).collect()}
    for doc_id, _, ws in docs:
        oov = sum(1 for w in ws if w not in vocab)
        r = got[doc_id]
        assert r["n_tokens"] == len(ws)
        assert r["n_oov"] == oov
        assert r["oov_ppm"] == (oov * 1_000_000 // len(ws) if ws else 0)


def test_dsir_select_matches_python_replay(spark):
    docs = _doc_words(spark)
    feats = {
        doc_id: [
            _hash64(f"{w[i]} {w[i + 1]}") % DSIR_FEATURES for i in range(len(w) - 1)
        ]
        for doc_id, _, w in docs
    }
    raw = Counter(f for fs in feats.values() for f in fs)
    tgt = Counter(
        f for doc_id, lang, _ in docs if lang == DSIR_TARGET_LANG
        for f in feats[doc_id]
    )
    scores = {}
    for doc_id, lang, _ in docs:
        if lang == DSIR_TARGET_LANG or not feats[doc_id]:
            continue
        rs = [(tgt[f] + 1) * 1_000_000 // (raw[f] + 1) for f in feats[doc_id]]
        scores[doc_id] = sum(rs) // len(rs)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:DSIR_TOP]
    got = sorted(dsir_select(spark, SF_DIR).collect(), key=lambda r: r["rank"])
    assert [(r["doc_id"], r["importance_ppm"]) for r in got] == expect
    assert [r["rank"] for r in got] == list(range(1, len(expect) + 1))
    # candidates come from the non-target pool only
    langs = {d: lang for d, lang, _ in docs}
    assert all(langs[r["doc_id"]] != DSIR_TARGET_LANG for r in got)


def test_lexicon_ops_edge_corpus_oracle_parity(spark, tmp_path):
    """Cross-engine parity on a handcrafted edge corpus: empty and
    whitespace-only docs, 1- and 2-word docs (no trigrams / one
    bigram), overlapping-run words for the BPE greedy merge, > VOCAB_TOP
    distinct words so OOV is non-trivial, and three docs sharing a
    trigram so the boilerplate hit path fires. The fixture corpus has
    none of these shapes — the CASE guards only this test exercises."""
    import duckdb

    from storm_bench_spark.plans.registry import get_spec
    from tests.oracle_utils import assert_frames_match

    many = " ".join(f"w{i}" for i in range(25))  # > VOCAB_TOP distinct
    docs = spark.createDataFrame(
        [
            (0, "", "en", "s0", 0),
            (1, "   ", "en", "s0", 3),
            (2, "solo", "fr", "s0", 4),
            (3, "pair word", "fr", "s1", 9),
            (4, "aaa aaa aaa bb bb", "de", "s1", 17),
            (5, "x y z tail one", "en", "s1", 14),
            (6, "x y z tail two", "fr", "s2", 14),
            (7, "x y z tail three", "de", "s2", 16),
            (8, many, "en", "s2", len(many)),
            (9, "x y z pair word", "es", "s3", 15),
            # overlap shapes for the greedy BPE merge: 'papa' repeats
            # the (p,a) pair back-to-back (both must merge), 'aaaa' is
            # a same-symbol run (greedy pairs -> aa,aa), 'banana' has
            # the l,r,l,r chain (a,n),(a,n) — the shared-pipe replace
            # bug merged each of these only once
            (10, "papa papa banana aaaa", "en", "s3", 21),
        ],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    for name in (
        "boilerplate_ngram_ratio",
        "vocab_oov_rate",
        "dsir_select",
        "bpe_merge_steps",
    ):
        spec = get_spec(name)
        out = spec.fn(spark, sf).toPandas()
        assert_frames_match(out, con.execute(spec.oracle).fetchdf(), f"edge:{name}")
    # targeted spot checks on the edge shapes
    boil = {r["doc_id"]: r for r in get_spec("boilerplate_ngram_ratio").fn(spark, sf).collect()}
    assert boil[0]["n_grams"] == 0 and boil[0]["boilerplate_ppm"] == 0
    assert boil[3]["n_grams"] == 0  # 2-word doc: no trigram positions
    assert boil[5]["n_frequent"] >= 2  # "x y z" + "y z tail" occur in 3 docs
    oov = {r["doc_id"]: r for r in get_spec("vocab_oov_rate").fn(spark, sf).collect()}
    assert oov[1]["n_tokens"] == 0 and oov[1]["oov_ppm"] == 0
    assert oov[8]["n_oov"] > 0  # 25 distinct words cannot all be in top-20
    dsir = get_spec("dsir_select").fn(spark, sf).collect()
    assert {r["doc_id"] for r in dsir} <= {3, 4, 6, 7, 9}  # non-en, >=2 words
    assert 2 not in {r["doc_id"] for r in dsir}  # 1-word doc has no bigram
    # the BPE merge log must equal the greedy replay — cross-engine
    # parity alone can't see a flaw shared by plan and oracle, and this
    # corpus forces the overlap merges ((a,a) runs, then (p,a) twice in
    # 'papa') into the first BPE_STEPS argmaxes
    wf = Counter(
        w
        for r in docs.select("text").collect()
        for w in re.split(r"\s+", r["text"])
        if w
    )
    expect = _bpe_greedy_replay(wf, BPE_STEPS)
    got = sorted(get_spec("bpe_merge_steps").fn(spark, sf).collect(), key=lambda r: r["step"])
    assert [(r["step"], r["left_sym"], r["right_sym"], r["pair_count"]) for r in got] == expect
    assert ("p", "a") in {(l, r) for _, l, r, _ in expect}  # the papa overlap pair fired


def _bpe_greedy_replay(word_freqs, steps):
    """Reference BPE trainer: weighted adjacent-pair counts, (count
    DESC, pair ASC) argmax, greedy left-to-right merge — including
    back-to-back repeats ('papa' merging (p,a) twice) and same-symbol
    runs ('aaaa' -> aa,aa)."""
    words = {w: (list(w), c) for w, c in word_freqs.items()}
    log = []
    for step in range(1, steps + 1):
        pairs = Counter()
        for syms, c in words.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        (bl, br), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        log.append((step, bl, br, cnt))
        for w, (syms, c) in words.items():
            out, i = [], 0
            while i < len(syms):  # greedy left-to-right merge
                if i + 1 < len(syms) and syms[i] == bl and syms[i + 1] == br:
                    out.append(bl + br)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, c)
    return log


def test_bpe_merges_match_python_replay(spark):
    docs = _doc_words(spark)
    wf = Counter(w for _, _, ws in docs for w in ws)
    expect = _bpe_greedy_replay(wf, BPE_STEPS)
    got = sorted(bpe_merge_steps(spark, SF_DIR).collect(), key=lambda r: r["step"])
    assert [(r["step"], r["left_sym"], r["right_sym"], r["pair_count"]) for r in got] == expect


def _bpe_apply_replay(word_freqs, doc_words, steps):
    """Train via _bpe_greedy_replay's rules, then encode each doc:
    per-word greedy merge, summed per document."""
    words = {w: (list(w), c) for w, c in word_freqs.items()}
    for _ in range(steps):
        pairs = Counter()
        for syms, c in words.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        (bl, br), _cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, (syms, c) in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == bl and syms[i + 1] == br:
                    out.append(bl + br)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, c)
    tok = {w: len(syms) for w, (syms, _c) in words.items()}
    out = {}
    for doc_id, ws in doc_words.items():
        if not ws:
            continue
        n_chars = sum(len(w) for w in ws)
        n_tokens = sum(tok[w] for w in ws)
        out[doc_id] = (len(ws), n_chars, n_tokens, n_tokens * 1_000_000 // n_chars)
    return out


def test_bpe_encode_matches_python_replay(spark):
    from storm_bench_spark.plans.lexicon_ops import bpe_encode

    docs = _doc_words(spark)
    wf = Counter(w for _, _, ws in docs for w in ws)
    doc_words = {doc_id: ws for doc_id, _, ws in docs}
    expect = _bpe_apply_replay(wf, doc_words, BPE_STEPS)
    got = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens"],
                      r["tokens_per_char_ppm"])
        for r in bpe_encode(spark, SF_DIR).collect()
    }
    assert got == expect
