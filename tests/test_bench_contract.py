"""Bench-harness contract: the driver records BENCH from bench.py's
stdout, so a HEADLINE entry that no longer resolves in the registry
(rename, removed query) would crash the whole per-round bench run.
Catch that at pytest time instead.
"""

from bench import HEADLINE
from storm_bench_spark.plans.registry import all_oracles, all_queries


def test_headline_names_resolve():
    missing = [n for n in HEADLINE if n not in all_queries()]
    assert not missing, f"bench.py HEADLINE references unknown queries: {missing}"


def test_headline_has_no_duplicates():
    dupes = {n for n in HEADLINE if HEADLINE.count(n) > 1}
    assert not dupes, f"bench.py HEADLINE lists queries twice: {dupes}"


def test_headline_queries_are_oracle_checked():
    # Every timed query must also be correctness-gated — a bench row
    # without an oracle would let a wrong-but-fast plan look like a win.
    missing = [n for n in HEADLINE if n not in all_oracles()]
    assert not missing, f"HEADLINE queries without oracles: {missing}"


def test_compact_summary_line_fits_driver_tail():
    """The driver parses bench.py's LAST stdout line from a 2 KB tail
    capture (bench.py:199-211 — BENCH_r04 was lost to an over-long
    line). The compact line is top-5-only so it does not grow with
    registry COUNT, but it does grow with query-NAME length: build the
    worst case the current registry could emit — the five longest
    names, max-width float values, worst total — and assert it clears
    the 2 KB tail with headroom. Adding a verbose field or switching
    back to the full dict fails here before it loses a round's BENCH."""
    import json

    names = sorted(all_queries(), key=len, reverse=True)[:5]
    worst_line = json.dumps({
        "metric": "headline_queries_total_wall",
        "value": 99999.999,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(all_queries()),
        "value_spread": 99999.999,
        "stream_floor_total": 99999.999,
        "queries": {n: 99999.999 for n in names},
        "detail": "BENCH_DETAIL.json",
        "duck_total": 99999.999,
        "pair_id": "2026-01-01T00:00:00",
        "ratio_vs_duck": 99.999,
        "ratio_pm": 99.999,
        "probe_drift": 9.999,
        "mode": "interleaved",
        "ratio_vs_duck_processing": 99.999,
        "annex_total": 99999.999,
        "sf1_total": 99999.999,
        "sf1_duck_total": 99999.999,
        "sf1_ratio": 99.999,
        "sf1_rows": 999,
        "final": False,
        "retake_recommended": (
            "probe_drift 9.999 > 0.1; value_spread 99999.999 > 15% of "
            "value 99999.999"
        ),
    })
    assert len(worst_line.encode()) < 1536, (
        f"compact bench line could reach {len(worst_line)} B; the driver "
        f"tail-captures 2048 B — trim fields or name lengths"
    )


def test_duck_twin_subset_mode_guards(tmp_path, monkeypatch):
    """ADVICE r7 (low): DUCK_QUERIES subset mode must refuse to run
    without an existing full-run DUCK_DETAIL.json (a subset-only sum
    would masquerade as the full-run metric) and must refuse cross-SF
    merges; a legal merge keeps the full-run rows, replaces the
    re-measured ones, and records per-query run counts."""
    import json

    import pytest

    from scripts import duck_twin as DT

    detail = tmp_path / "DUCK_DETAIL.json"
    monkeypatch.setattr(DT, "DETAIL", str(detail))
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "1")
    # fast subset so main() measures one real oracle, not 132
    monkeypatch.setenv("DUCK_QUERIES", "wordcount")
    with pytest.raises(SystemExit, match="full-run"):
        DT.main()  # no detail file yet -> refuse
    # a "full run" recorded at a DIFFERENT sf -> refuse
    detail.write_text(json.dumps(
        {"sf": 0.01, "runs": 2, "queries": {"wordcount": 0.5, "grep": 0.1}}
    ))
    with pytest.raises(SystemExit, match="refusing to merge"):
        DT.main()
    # legal merge: same sf — keeps grep, replaces wordcount, records
    # per-query run counts for both generations
    detail.write_text(json.dumps(
        {"sf": 0.001, "runs": 2, "queries": {"wordcount": 0.5, "grep": 0.1}}
    ))
    DT.main()
    merged = json.loads(detail.read_text())
    assert set(merged["queries"]) == {"wordcount", "grep"}
    assert merged["queries"]["grep"] == 0.1
    assert merged["queries"]["wordcount"] != 0.5  # re-measured
    assert merged["runs_by_query"] == {"grep": 2, "wordcount": 1}
    assert "pair_id" not in merged  # standalone subset breaks pairing


def test_scale_tier_env_selection_validated(monkeypatch):
    """ADVICE r11 (low): a typo in SPARK_GRAFT_SCALE_TIER_QUERIES must
    fail BEFORE the expensive R=10 replica build, not KeyError mid-tier.
    run_scale_tier validates the selection against the registry first —
    so with a bogus name it exits without ever touching spark (passing
    spark=None proves no Spark work preceded the check)."""
    import pytest

    from bench import run_scale_tier

    monkeypatch.setenv("SPARK_GRAFT_SCALE_TIER_QUERIES", "no_such_query")
    with pytest.raises(SystemExit, match="no_such_query"):
        run_scale_tier(None, {"wordcount": None}, {}, "/nonexistent")


def test_scale_tier_names_resolve():
    # same failure mode as HEADLINE: a renamed query in the sf1 tier
    # list would crash the bench's tier leg at driver time
    from bench import SF1_TIER, SF1_TIER_SPARK_ONLY

    qs, osql = all_queries(), all_oracles()
    missing = [n for n in SF1_TIER + sorted(SF1_TIER_SPARK_ONLY) if n not in qs]
    assert not missing, f"sf1 tier references unknown queries: {missing}"
    # ratio rows must have oracles (they carry the 2x adjudication);
    # spark-only rows are the documented quadratic-oracle set
    no_oracle = [n for n in SF1_TIER if n not in osql]
    assert not no_oracle, f"sf1 ratio rows without oracles: {no_oracle}"
    overlap = set(SF1_TIER) & set(SF1_TIER_SPARK_ONLY)
    assert not overlap, f"rows listed both ratio and spark-only: {overlap}"
    dupes = {n for n in SF1_TIER if SF1_TIER.count(n) > 1}
    assert not dupes, f"sf1 tier lists queries twice: {dupes}"


def test_scale_tier_warm_lap_protocol(spark, tmp_path, monkeypatch):
    """Round 13: the tier runs the headline's warm-lap protocol — one
    untimed execution of every row first, then the timed min-of-runs
    lap, duck symmetric — and SPARK_GRAFT_SCALE_WARM=0 reproduces the
    pre-r13 adaptive-sampling path. Exercised end-to-end on a tiny
    sf0.001-based replica so the assertion covers the real loop, not
    a mock: sample counts, the warmed flags, the recorded protocol
    fields, and replica reuse via the shared provenance marker."""
    from bench import run_scale_tier
    from scripts.scale_smoke import read_replica_marker

    dst = str(tmp_path / "tier_replica")
    monkeypatch.setenv("SPARK_GRAFT_SCALE_DIR", dst)
    monkeypatch.setenv("SPARK_GRAFT_SCALE_TIER_QUERIES", "wordcount")
    monkeypatch.setenv("SPARK_GRAFT_SCALE_RUNS", "2")
    base = "/root/testdata/sf0.001"

    out = run_scale_tier(spark, all_queries(), all_oracles(), base)
    assert out["warm_run"] is True
    assert out["warmed"] == {"wordcount": True}
    # warm execution discarded: exactly `runs` timed samples, both legs
    assert out["n_samples"] == {"wordcount": 2}
    assert out["duck_n_samples"] == {"wordcount": 2}
    assert out["ratio"]["wordcount"] is not None
    marker = read_replica_marker(dst)
    assert marker == {"base": base, "r": out["r"]}

    # opt-out reproduces the r10-r12 protocol (first sample timed,
    # adaptive top-up) and reuses the replica without a rebuild
    monkeypatch.setenv("SPARK_GRAFT_SCALE_WARM", "0")
    out2 = run_scale_tier(spark, all_queries(), all_oracles(), base)
    assert out2["warm_run"] is False
    assert out2["warmed"] == {"wordcount": False}
    assert out2["n_samples"] == {"wordcount": 2}
    assert out2["replicate_build_s"] < 1.0  # marker hit — no rebuild


def test_full_sweep_settle_guard_pieces(monkeypatch):
    """The settle guard's primitives: MemAvailable parses to a float
    (or inf without procfs), the JVM scan never lists this python
    process, and settle() returns promptly on an idle box instead of
    sleeping toward its timeout."""
    import time

    from scripts import full_sweep as FS

    avail = FS._mem_available_gib()
    assert avail > 0
    monkeypatch.setattr(FS, "_mem_available_gib", lambda: float("inf"))
    monkeypatch.setattr(FS, "_other_jvms", lambda: [])
    t0 = time.time()
    FS.settle(max_wait_s=30.0)
    assert time.time() - t0 < 2.0
