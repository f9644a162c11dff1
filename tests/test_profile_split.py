"""Semantic invariants for the late round-7 operators (incremental
admission, split census, table profile, TF-IDF keywords, source
overlap, keep-best survivorship, PMI collocations). The SQL-oracle
equality for each runs in test_correctness.py; these assert what that
comparison can't express: partition-exhaustiveness, disjointness from
the corpus side, per-doc rank structure, pair-attribution totals,
argmax policy, and full pure-Python replays where plan and oracle
share a formula.
"""

from collections import Counter

from pyspark.sql import functions as F

from storm_bench_spark.functions.hashing import hash64
from storm_bench_spark.functions.text import word_split
from storm_bench_spark.plans.analytics_ext import _PROFILE_COLS, table_profile
from storm_bench_spark.plans.corpus_ops import _TFIDF_TOP, tfidf_top_terms
from storm_bench_spark.plans.pipeline import incremental_dedup
from storm_bench_spark.plans.training_prep import corpus_split
from storm_bench_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_corpus_split_is_an_exhaustive_partition(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    out = corpus_split(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in out) == n_docs
    assert {r["split"] for r in out} <= {"train", "valid", "test"}
    # 90/5/5 hash gate: train must dominate at any non-trivial corpus
    per_split = Counter()
    for r in out:
        per_split[r["split"]] += r["n_docs"]
    assert per_split["train"] > per_split["valid"]
    assert per_split["train"] > per_split["test"]
    # (split, lang) keys are unique — it's a census, not a log
    keys = [(r["split"], r["lang"]) for r in out]
    assert len(keys) == len(set(keys))


def test_corpus_split_token_sums_match_recount(spark):
    docs = load_table(spark, SF_DIR, "documents")
    b = hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    split = F.when(b < 90, "train").when(b < 95, "valid").otherwise("test")
    expect = {
        (r["s"], r["lang"]): r["nt"]
        for r in docs.groupBy(split.alias("s"), "lang")
        .agg(F.sum(F.size(word_split("text"))).alias("nt"))
        .collect()
    }
    got = {
        (r["split"], r["lang"]): r["n_tokens"]
        for r in corpus_split(spark, SF_DIR).collect()
    }
    assert got == expect


def test_incremental_dedup_survivors_disjoint_from_corpus(spark):
    docs = load_table(spark, SF_DIR, "documents")
    in_corpus = (
        hash64(F.concat(F.lit("inc:"), F.col("doc_id").cast("string"))) % 10 < 7
    )
    tagged = docs.select(
        "doc_id", F.md5("text").alias("h"), in_corpus.alias("c")
    ).collect()
    corpus_hashes = {r["h"] for r in tagged if r["c"]}
    batch = [(r["h"], r["doc_id"]) for r in tagged if not r["c"]]
    out = {r["text_hash"]: (r["keeper"], r["batch_cnt"])
           for r in incremental_dedup(spark, SF_DIR).collect()}
    # no survivor's content exists in the corpus side
    assert not (set(out) & corpus_hashes)
    # survivors are exactly the batch hashes outside the corpus,
    # keeper is the min batch doc_id, batch_cnt the batch multiplicity
    expect = {}
    for h, d in batch:
        if h in corpus_hashes:
            continue
        k, c = expect.get(h, (d, 0))
        expect[h] = (min(k, d), c + 1)
    assert out == expect


def test_table_profile_bounds(spark):
    n = load_table(spark, SF_DIR, "events").count()
    rows = {r["column_name"]: r for r in table_profile(spark, SF_DIR).collect()}
    assert set(rows) == set(_PROFILE_COLS)
    for c, r in rows.items():
        assert 0 <= r["n_null"] <= n, c
        assert 0 <= r["n_distinct"] <= n - r["n_null"], c
    # event_id is the fixture's primary key
    assert rows["event_id"]["n_null"] == 0
    assert rows["event_id"]["n_distinct"] == n


def test_tfidf_ranks_are_dense_and_terms_in_doc(spark):
    out = tfidf_top_terms(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    docs = {
        r["doc_id"]: set(r["w"])
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", word_split("text").alias("w"))
        .collect()
    }
    for doc_id, rows in by_doc.items():
        rks = sorted(r["rk"] for r in rows)
        assert rks == list(range(1, len(rows) + 1))
        assert len(rows) <= _TFIDF_TOP
        for r in rows:
            assert r["term"] in docs[doc_id]
            assert r["tfidf"] > 0.0
    # every doc with at least one token yields at least one keyword
    assert set(by_doc) == {d for d, w in docs.items() if w}


def test_source_overlap_counts_match_pair_attribution(spark):
    from storm_bench_spark.plans.curation import source_overlap
    from storm_bench_spark.plans.dedup_queries import minhash_lsh

    pairs = [(r["a"], r["b"]) for r in minhash_lsh(spark, SF_DIR).collect()]
    src = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    }
    expect = Counter(
        tuple(sorted((src[a], src[b]))) for a, b in pairs
    )
    got = {
        (r["src_a"], r["src_b"]): r["ndup_pairs"]
        for r in source_overlap(spark, SF_DIR).collect()
    }
    assert got == dict(expect)
    assert sum(got.values()) == len(pairs)
    for a, b in got:
        assert a <= b  # canonical cell key


def test_dedup_keep_best_picks_longest_member(spark):
    from storm_bench_spark.plans.curation import dedup_keep_best, neardup_clusters

    cc = [(r["node"], r["comp"]) for r in neardup_clusters(spark, SF_DIR).collect()]
    toks = {
        r["doc_id"]: r["nt"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.size(word_split("text")).alias("nt"))
        .collect()
    }
    members: dict[int, list[int]] = {}
    for node, comp in cc:
        members.setdefault(comp, []).append(node)
    out = {
        r["comp"]: (r["keeper"], r["keeper_tokens"], r["n_members"])
        for r in dedup_keep_best(spark, SF_DIR).collect()
    }
    assert set(out) == set(members)
    for comp, ms in members.items():
        best = min(ms, key=lambda n: (-toks[n], n))
        assert out[comp] == (best, toks[best], len(ms)), comp


def test_pmi_bigrams_replay(spark):
    """Pure-Python replay of the full PMI computation (third-party
    check — plan and oracle share the formula, so the cross-engine
    gate alone would be blind to a shared formula bug)."""
    from storm_bench_spark.plans.corpus_ops import PMI_MIN_COUNT, PMI_TOP, pmi_bigrams

    texts = [
        r["w"]
        for r in load_table(spark, SF_DIR, "documents")
        .select(word_split("text").alias("w"))
        .collect()
    ]
    uni: Counter = Counter()
    bi: Counter = Counter()
    for w in texts:
        uni.update(w)
        bi.update(zip(w, w[1:]))
    n_uni = sum(uni.values())
    n_bi = sum(bi.values())
    scored = [
        (c * float(n_uni) * float(n_uni) / (float(n_bi) * float(uni[a]) * float(uni[b])), a, b, c)
        for (a, b), c in bi.items()
        if c >= PMI_MIN_COUNT
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = [
        (a, b, c, round(s, 6), i + 1) for i, (s, a, b, c) in enumerate(scored[:PMI_TOP])
    ]
    got = [
        (r["w1"], r["w2"], r["c_xy"], r["pmi_ratio"], r["rank"])
        for r in pmi_bigrams(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == expect


def test_containment_pairs_replay(spark):
    """Pure-Python full replay (shingles → DF-capped candidates →
    exact containment): plan and oracle share the candidate rule, so
    the cross-engine gate alone can't catch a shared rule bug."""
    import re as _re

    from storm_bench_spark.functions.text import WS_RUN_PATTERN
    from storm_bench_spark.operators.dedup import DF_CAP, MIN_SHARED
    from storm_bench_spark.plans.dedup_queries import CONTAIN_T, containment_pairs

    docs = {
        r["doc_id"]: [w for w in _re.split(WS_RUN_PATTERN, r["text"]) if w]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    shs = {
        d: {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        for d, w in docs.items()
        if len(w) >= 3
    }
    df: Counter = Counter()
    for s in shs.values():
        df.update(s)
    inv: dict[str, list[int]] = {}
    for d, s in shs.items():
        for sh in s:
            if df[sh] <= DF_CAP:
                inv.setdefault(sh, []).append(d)
    shared: Counter = Counter()
    for ds in inv.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                shared[(ds[i], ds[j])] += 1
    expect = {}
    for (a, b), n in shared.items():
        if n < MIN_SHARED:
            continue
        ix = len(shs[a] & shs[b])
        cont = round(ix / min(len(shs[a]), len(shs[b])), 6)
        if ix > 0 and cont >= CONTAIN_T:
            expect[(a, b)] = cont
    got = {
        (r["a"], r["b"]): r["containment"]
        for r in containment_pairs(spark, SF_DIR).collect()
    }
    assert got == expect and len(got) > 0


def test_kmv_distinct_users_replay(spark):
    """Pure-Python replay of the KMV sketch: bottom-K selection, the
    merge rule for __all__, the estimator branch, and the truth
    column."""
    import hashlib

    from storm_bench_spark.plans.sketch_queries import K_KMV, _KMV_M, kmv_distinct_users

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "user_id")
        .collect()
    )
    per_type: dict[str, set] = {}
    for r in rows:
        h = int(hashlib.md5(f"kmv:{r['user_id']}".encode()).hexdigest()[:15], 16)
        per_type.setdefault(r["event_type"], set()).add(h)
    def sketch(hs):
        kept = sorted(hs)[:K_KMV]
        n, hk = len(kept), max(kept)
        est = float(n) if n < K_KMV else (K_KMV - 1) * float(_KMV_M) / float(hk)
        return n, hk, round(est, 3)
    expect = {}
    for t, hs in per_type.items():
        n, hk, est = sketch(hs)
        expect[t] = (n, hk, est, len(hs))
    merged_kept = set()
    for hs in per_type.values():
        merged_kept |= set(sorted(hs)[:K_KMV])
    glob = set().union(*per_type.values())
    n, hk, est = sketch(merged_kept)
    expect["__all__"] = (n, hk, est, len(glob))
    got = {
        r["event_type"]: (r["n_kept"], r["kth_hash"], r["est_distinct"], r["exact_distinct"])
        for r in kmv_distinct_users(spark, SF_DIR).collect()
    }
    assert got == expect
    # the merge rule itself: merged-kept bottom-K == global bottom-K
    assert sorted(merged_kept)[:K_KMV] == sorted(glob)[:K_KMV]


def test_streaming_kmv_matches_batch_sketch(spark):
    """Stream/batch parity engine-side: the keyed-state bottom-K final
    sketch equals the batch KMV rows (micro-batch-boundary invariance
    of the set-min fold)."""
    from storm_bench_spark.plans.sketch_queries import (
        kmv_distinct_users,
        streaming_kmv_sketch,
    )

    batch = {
        r["event_type"]: (r["n_kept"], r["kth_hash"])
        for r in kmv_distinct_users(spark, SF_DIR).collect()
        if r["event_type"] != "__all__"
    }
    stream = {
        r["event_type"]: (r["n_kept"], r["kth_hash"])
        for r in streaming_kmv_sketch(spark, SF_DIR).collect()
    }
    assert stream == batch


def test_streaming_kmv_multibatch_unfilled_extraction(spark, tmp_path):
    """ADVICE r7 (medium): while the sketch is UNFILLED (n_kept < K),
    each new distinct hash RAISES kth_hash, so extracting the final
    sketch as field-wise (max(n_kept), min(kth_hash)) pairs an early
    kth with a late n_kept. Replay the advice's exact scenario —
    batch1 {5}, batch2 adds {10} — as two real micro-batches
    (maxFilesPerTrigger=1) and assert the latest-emission extraction
    returns (2, 10), not the field-wise (2, 5). A third batch carrying
    only null h (ADVICE r7 low: e.g. hash64 of a null user_id) must
    not kill the stream: for a key with existing state it re-emits the
    unchanged sketch; a key whose only rows ever are null emits
    nothing."""
    import os

    import pandas as pd

    from storm_bench_spark.plans.sketch_queries import kmv_extract_latest
    from storm_bench_spark.streaming.stateful import bottomk_state
    from storm_bench_spark.streaming.streams import run_to_memory

    d = tmp_path / "kmv_batches"
    d.mkdir()
    frames = [
        pd.DataFrame({"key": ["a"], "h": pd.array([5], dtype="Int64")}),
        pd.DataFrame({"key": ["a"], "h": pd.array([10], dtype="Int64")}),
        pd.DataFrame(
            {"key": ["a", "b"], "h": pd.array([None, None], dtype="Int64")}
        ),
    ]
    for i, pdf in enumerate(frames):
        p = d / f"part{i}.parquet"
        pdf.to_parquet(p, index=False)
        # file-source batches arrive in mtime order; pin it
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    schema = spark.read.parquet(str(d)).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    emitted = run_to_memory(
        bottomk_state(src, "key", "h", 64), output_mode="append"
    )
    rows = emitted.collect()
    # key a emits per batch (the all-null batch re-emits its unchanged
    # sketch); key b — null-only forever — never emits and never crashes
    assert sorted((r["key"], r["n_kept"], r["kth_hash"]) for r in rows) == [
        ("a", 1, 5),
        ("a", 2, 10),
        ("a", 2, 10),
    ]
    got = {
        (r["key"], r["n_kept"], r["kth_hash"])
        for r in kmv_extract_latest(emitted).collect()
    }
    assert got == {("a", 2, 10)}
    # the field-wise extraction this replaces would have said 5:
    fieldwise = emitted.groupBy("key").agg(
        F.max("n_kept").alias("n"), F.min("kth_hash").alias("k")
    ).collect()[0]
    assert (fieldwise["n"], fieldwise["k"]) == (2, 5)
