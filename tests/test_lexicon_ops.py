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


def test_bpe_merges_match_python_replay(spark):
    docs = _doc_words(spark)
    wf = Counter(w for _, _, ws in docs for w in ws)
    words = {w: (list(w), c) for w, c in wf.items()}
    expect = []
    for step in range(1, BPE_STEPS + 1):
        pairs = Counter()
        for syms, c in words.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        (bl, br), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((step, bl, br, cnt))
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
    got = sorted(bpe_merge_steps(spark, SF_DIR).collect(), key=lambda r: r["step"])
    assert [(r["step"], r["left_sym"], r["right_sym"], r["pair_count"]) for r in got] == expect
