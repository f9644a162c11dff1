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
