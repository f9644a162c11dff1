"""scrub_ops semantics on crafted corpora: the sf0.001/sf0.01 fixtures
exercise the operators end-to-end against their DuckDB oracles
(tests/test_correctness.py sweeps the registry), but both engines share
the problem DECOMPOSITION — these tests check the semantics against an
independent pure-Python replay (brute-force interval union, dict-based
frequency rule) on shapes the fixtures can't force: overlap chains
across the island boundary, exact-gap adjacency, all-boilerplate docs,
sub-window documents.

pagerank gets the same treatment: a NumPy float power iteration agrees
with the integer fixed-point loop to within the fixed-point rounding
envelope, and hand-computable graphs are checked exactly.
"""

from pyspark.sql import functions as F

from storm_bench_spark.operators.graph import PR_SCALE, pagerank
from storm_bench_spark.plans.scrub_ops import span_coverage, strip_common_segments


def _words_df(spark, docs):
    df = spark.createDataFrame(docs, schema="doc_id long, text string")
    return df.select(
        "doc_id",
        F.filter(F.split("text", r"\s+"), lambda w: w != F.lit("")).alias("w"),
    )


def _brute_coverage(corpus, k):
    """Pure-Python replay: exact window multiset + brute interval union."""
    from collections import Counter

    toks = {d: t.split() for d, t in corpus}
    counts = Counter(
        " ".join(t[i : i + k]) for t in toks.values() for i in range(len(t) - k + 1)
    )
    out = {}
    for d, t in toks.items():
        covered = set()
        for i in range(len(t) - k + 1):
            if counts[" ".join(t[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        n = len(t)
        out[d] = (n, len(covered), 0 if n == 0 else len(covered) * 1_000_000 // n)
    return out


def _spark_coverage(spark, corpus, k):
    rows = span_coverage(_words_df(spark, corpus), k=k).collect()
    return {r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_ppm"]) for r in rows}


def test_span_coverage_matches_brute_force(spark):
    # within-doc repeat, cross-doc repeat, overlap chain, unique doc,
    # sub-window doc — every branch of the operator in one corpus
    corpus = [
        (1, "a b c d a b c d x y"),       # within-doc repeated 4-gram
        (2, "p q r s t u v w"),           # shares 4-gram with doc 3
        (3, "z z p q r s t z"),           # overlapping dup windows chain
        (4, "unique words only here now"), # no duplication
        (5, "a b"),                        # shorter than the window
    ]
    assert _spark_coverage(spark, corpus, 4) == _brute_coverage(corpus, 4)


def test_span_coverage_island_merge_handles_exact_gap(spark):
    # two duplicated windows whose starts differ by EXACTLY k: disjoint
    # but adjacent intervals — the merge must count 2k tokens, not k,
    # and not double-count the shared boundary
    base = "m1 m2 m3 n1 n2 n3 q1 q2 q3 r1 r2 r3"
    corpus = [(1, base), (2, base)]  # everything duplicated
    out = _spark_coverage(spark, corpus, 3)
    brute = _brute_coverage(corpus, 3)
    assert out == brute
    assert out[1][1] == 12  # full doc covered

    # duplicated prefix + duplicated suffix with a unique middle gap
    corpus2 = [
        (1, "a b c GAP1uniq GAP2uniq x y z"),
        (2, "a b c othermid1 othermid2 x y z"),
    ]
    out2 = _spark_coverage(spark, corpus2, 3)
    assert out2 == _brute_coverage(corpus2, 3)
    assert out2[1] == (8, 6, 750000)  # two 3-islands, middle 2 uncovered


def _brute_strip(corpus, seg, min_docs):
    from collections import defaultdict

    segs = {
        d: [t.split()[i : i + seg] for i in range(0, len(t.split()), seg)]
        for d, t in corpus
    }
    docs_per_seg = defaultdict(set)
    for d, ss in segs.items():
        for s in ss:
            docs_per_seg[" ".join(s)].add(d)
    out = {}
    for d, ss in segs.items():
        kept = [" ".join(s) for s in ss if len(docs_per_seg[" ".join(s)]) < min_docs]
        out[d] = (len(ss), len(ss) - len(kept), " ".join(kept))
    return out


def test_strip_common_segments_matches_brute_force(spark):
    boiler = "cookie notice accept all terms"  # 5-token segment, 3 docs
    corpus = [
        (1, f"{boiler} real content one here now"),
        (2, f"{boiler} other body text goes here"),
        (3, f"different lead in words here {boiler}"),
        (4, f"{boiler}"),                      # all-boilerplate doc -> ''
        (5, "twice repeated segment only ok"),  # 2-doc repeat: kept
        (6, "twice repeated segment only ok"),
    ]
    rows = strip_common_segments(_words_df(spark, corpus), seg_tokens=5, min_docs=3)
    got = {
        r["doc_id"]: (r["n_segments"], r["n_removed"], r["clean_text"])
        for r in rows.collect()
    }
    assert got == _brute_strip(corpus, 5, 3)
    assert got[4] == (1, 1, "")          # all segments removed
    assert got[5][1] == 0                 # 2-doc repeat survives


def test_strip_common_segments_ragged_tail_is_its_own_segment(spark):
    # a doc whose tail segment is short must not merge into a neighbor;
    # the short tail "x y" repeats in 3 docs and is removed as a unit
    corpus = [
        (1, "a1 a2 a3 x y"),
        (2, "b1 b2 b3 x y"),
        (3, "c1 c2 c3 x y"),
    ]
    rows = strip_common_segments(_words_df(spark, corpus), seg_tokens=3, min_docs=3)
    got = {r["doc_id"]: (r["n_segments"], r["n_removed"], r["clean_text"]) for r in rows.collect()}
    assert got == _brute_strip(corpus, 3, 3)
    assert got[1] == (2, 1, "a1 a2 a3")


def _pr(spark, edges, iters=3):
    df = spark.createDataFrame(edges, schema="a long, b long")
    return {r["node"]: r["rank_scaled"] for r in pagerank(df, iters=iters).collect()}


def test_pagerank_symmetric_pair_is_uniform(spark):
    # one edge: both nodes have deg 1 and feed each other — ranks stay
    # exactly at the uniform fixed point every round
    out = _pr(spark, [(7, 9)])
    base = PR_SCALE // 2
    expect = (15 * base + 85 * base) // 100
    assert out == {7: expect, 9: expect}


def test_pagerank_star_center_dominates(spark):
    # star: center 0 with 4 leaves — the center must outrank leaves,
    # and the exact integer sequence is hand-replayable
    edges = [(0, i) for i in range(1, 5)]
    out = _pr(spark, edges, iters=3)
    n = 5
    base = PR_SCALE // n
    r = {0: base, **{i: base for i in range(1, 5)}}
    deg = {0: 4, **{i: 1 for i in range(1, 5)}}
    for _ in range(3):
        contrib = {v: 0 for v in r}
        for a, b in edges:
            contrib[b] += r[a] // deg[a]
            contrib[a] += r[b] // deg[b]
        r = {v: (15 * base + 85 * contrib[v]) // 100 for v in r}
    assert out == r
    assert out[0] > out[1]


def test_pagerank_tracks_float_power_iteration(spark):
    # integer fixed-point vs numpy float reference on an irregular
    # graph: agreement within the rounding envelope (iters+1 integer
    # divisions, each losing < 1 unit per term, scaled by node count)
    import numpy as np

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0), (5, 4)]
    out = _pr(spark, edges, iters=3)
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    adj = np.zeros((n, n))
    for a, b in edges:
        adj[idx[a], idx[b]] = adj[idx[b], idx[a]] = 1
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        r = 0.15 / n + 0.85 * (adj.T @ (r / deg))
    for v in nodes:
        assert abs(out[v] - r[idx[v]] * PR_SCALE) < 1e-4 * PR_SCALE


def test_pagerank_empty_graph_returns_empty(spark):
    df = spark.createDataFrame([], schema="a long, b long")
    assert pagerank(df).count() == 0


def _brute_redact(docs):
    """Python re replay of redact_pii — same patterns, same chain."""
    import re

    from storm_bench_spark.plans.scrub_ops import PII_MAX_PPM, PII_PATTERNS

    out = {}
    for d, t in docs:
        counts = tuple(len(re.findall(pat, t)) for _, pat, _ in PII_PATTERNS)
        pii_chars = sum(
            len(m) for _, pat, _m in PII_PATTERNS for m in re.findall(pat, t)
        )
        ppm = 0 if not t else pii_chars * 1_000_000 // len(t)
        clean = t
        for _, pat, marker in PII_PATTERNS:
            clean = re.sub(pat, marker.replace("\\", "\\\\"), clean)
        out[d] = (*counts, ppm, int(ppm <= PII_MAX_PPM), clean)
    return out


def test_redact_pii_matches_python_re(spark):
    from storm_bench_spark.plans.scrub_ops import redact_pii

    docs = [
        (1, "mail a.b-c_d%e+f@sub.example.co today"),   # full local-part class
        (2, "x@y.io and z@w.org twice"),                 # two emails, 'g' path
        (3, "call +1-555-010-2030 or fax +1-555-010-2031"),
        (4, "host 10.0.255.3 then 192.168.1.1"),
        (5, "ssn 123-45-6789 mid text"),
        (6, "nothing to redact here"),                   # zero path, ppm 0
        (7, "almost 12-34-5678 and 1.2.3 and a@b"),      # shaped-wrong: kept
        (8, "u@v.net +1-200-300-4000 7.8.9.10 321-54-9876"),  # all four; >10% PII
        (9, "a@b.co starts the line"),                   # match at offset 0
        (10, "x@example.com"),                           # 100% PII -> dropped
    ]
    df = spark.createDataFrame(docs, schema="doc_id long, pii_text string")
    got = {
        r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_ips"], r["n_ssns"],
                      r["pii_ppm"], r["keep"], r["clean_text"])
        for r in redact_pii(df).collect()
    }
    assert got == _brute_redact(docs)
    assert got[6] == (0, 0, 0, 0, 0, 1, "nothing to redact here")
    assert got[8][:4] == (1, 1, 1, 1)
    assert got[8][6] == "[EMAIL] [PHONE] [IP] [SSN]"
    assert got[10][4] == 1_000_000 and got[10][5] == 0  # all-PII doc dropped


def test_pii_injection_covers_every_category_and_both_gate_sides(spark):
    # the derived corpus must actually exercise each pattern — a
    # regression that stops injecting (or injects unmatchable strings)
    # would make the registered query vacuously green
    from storm_bench_spark.plans.scrub_ops import pii_scrub

    out = pii_scrub(spark, "/root/testdata/sf0.001")
    agg = out.groupBy().sum("n_emails", "n_phones", "n_ips", "n_ssns").collect()[0]
    assert all(v > 0 for v in agg), f"a PII category never fired: {agg}"
    kept = {r["keep"] for r in out.select("keep").distinct().collect()}
    assert kept == {0, 1}, f"release gate never exercised both sides: {kept}"


def test_dup_span_extents_matches_brute_force_and_coverage(spark):
    """exact_dup_spans (round 13): per-doc maximal duplicated spans
    must equal the brute-force interval union's maximal runs, and the
    per-doc SUM of span_tokens must equal span_coverage's dup_tokens —
    the two operators are the same islands pipeline, one emitting, one
    aggregating."""
    from storm_bench_spark.plans.scrub_ops import dup_span_extents

    corpus = [
        (1, "a b c d a b c d x y"),        # within-doc repeated 4-gram
        (2, "p q r s t u v w"),            # shares 4-gram with doc 3
        (3, "z z p q r s t z"),            # overlapping dup windows chain
        (4, "unique words only here now"),  # no duplication -> no rows
        (5, "a b"),                         # shorter than the window
        (6, "p q r s x1 x2 x3 x4 x5 J J J J"),  # TWO islands (gap > k)
        (7, "J J J J k"),                   # partner for doc 6's middle
    ]
    k = 4
    rows = dup_span_extents(_words_df(spark, corpus), k=k).collect()

    # brute force: covered-token runs per doc
    from collections import Counter

    toks = {d: t.split() for d, t in corpus}
    counts = Counter(
        " ".join(t[i : i + k]) for t in toks.values() for i in range(len(t) - k + 1)
    )
    expect = {}
    for d, t in toks.items():
        starts = [
            i
            for i in range(len(t) - k + 1)
            if counts[" ".join(t[i : i + k])] >= 2
        ]
        spans = []
        for i in starts:
            if spans and i - spans[-1][1] <= k:
                spans[-1] = (spans[-1][0], i, spans[-1][2] + 1)
            else:
                spans.append((i, i, 1))
        for s, e, nw in spans:
            expect[(d, s)] = (e - s + k, nw)
    got = {
        (r["doc_id"], r["span_start"]): (r["span_tokens"], r["n_windows"])
        for r in rows
    }
    assert got == expect
    assert any(d == 6 for d, _ in got) and sum(d == 6 for d, _ in got) >= 2

    # coverage consistency with the aggregating twin
    cov = {
        r["doc_id"]: r["dup_tokens"]
        for r in span_coverage(_words_df(spark, corpus), k=k).collect()
        if r["dup_tokens"] > 0
    }
    agg = {}
    for (d, _), (st, _) in got.items():
        agg[d] = agg.get(d, 0) + st
    assert agg == cov
