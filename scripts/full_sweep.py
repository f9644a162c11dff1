#!/usr/bin/env python
"""Full-registry oracle sweep via the vanilla driver path.

Replays every registered query against its DuckDB oracle at sf0.01 —
the same comparison the driver's 50-slot correctness gate runs, but
over the WHOLE registry — and prints one JSON summary line. This is
the round-closing evidence recorded in COVERAGE.md; before round 13 it
was re-typed inline each round.

SETTLE GUARD (VERDICT r12 next #7): twice (r7, r12) a sweep launched
back-to-back after a pytest/bench run hit DuckDB malloc failures while
the PREVIOUS process's JVM was still tearing down — multi-GB of
off-heap memory released asynchronously after the python process
exits — and was clean on a settled re-run. The guard waits, before
creating any session, for (a) no other live ``java`` process and
(b) MemAvailable above a floor, so a future driver-side red cannot be
that transient misread as a correctness failure.

Usage:
    python scripts/full_sweep.py                     # sf0.01, all queries
    SWEEP_SF_DIR=/root/testdata/sf0.001 python scripts/full_sweep.py
    SWEEP_QUERIES=wordcount,grep python scripts/full_sweep.py
    SWEEP_SETTLE=0 python scripts/full_sweep.py      # skip the guard
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path[:0] = [
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
]

def _mem_available_gib() -> float:
    try:
        with open("/proc/meminfo") as f:
            for ln in f:
                if ln.startswith("MemAvailable:"):
                    return int(ln.split()[1]) / (1024 * 1024)
    except OSError:
        pass
    return float("inf")  # non-Linux / no procfs: don't block on the guard


def _other_jvms() -> list[str]:
    """Live ``java`` processes NOT owned by this python process.

    ADVICE r13: the old exclusion compared each java PID to
    ``os.getpid()`` — this process is python, so that never matched
    (dead code), and had settle() ever run after this script's own
    SparkSession existed, its own child JVM would have deadlocked the
    guard. Compare the java process's PPID to our PID instead, and
    skip malformed ps lines rather than crashing the sweep."""
    out = subprocess.run(
        ["ps", "-eo", "pid=,ppid=,comm="], capture_output=True, text=True
    ).stdout
    me = os.getpid()
    jvms = []
    for ln in out.splitlines():
        parts = ln.split(None, 2)
        if len(parts) != 3 or parts[2].strip() != "java":
            continue
        try:
            ppid = int(parts[1])
        except ValueError:
            continue
        if ppid != me:
            jvms.append(ln.strip())
    return jvms


def settle(max_wait_s: float = 180.0, min_avail_gib: float = 8.0) -> None:
    """Block until no foreign JVM is live and memory has settled."""
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        jvms = _other_jvms()
        avail = _mem_available_gib()
        if not jvms and avail >= min_avail_gib:
            if time.time() - t0 > 1:
                print(
                    f"# settled after {time.time() - t0:.0f}s "
                    f"(MemAvailable {avail:.1f} GiB)",
                    file=sys.stderr,
                )
            return
        print(
            f"# settle guard: {len(jvms)} live JVM(s), "
            f"MemAvailable {avail:.1f} GiB — waiting",
            file=sys.stderr,
        )
        time.sleep(5)
    print(
        f"# settle guard TIMED OUT after {max_wait_s:.0f}s — proceeding; "
        "a duck-side malloc failure below may be the r7/r12 teardown "
        "transient, not a correctness signal",
        file=sys.stderr,
    )


def main() -> None:
    if os.environ.get("SWEEP_SETTLE", "1") != "0":
        settle()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from oracle_utils import assert_frames_match
    from storm_bench_spark.sources.tables import TABLES

    sf_dir = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # vanilla session on purpose — this mirrors the driver, which never
    # calls the engine's get_spark(); __spark_entry__._configure must
    # keep making a foreign session work
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .appName("sbs-full-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = E.queries(), E.oracle_sql()
    sel = os.environ.get("SWEEP_QUERIES")
    names = [n.strip() for n in sel.split(",")] if sel else sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"SWEEP_QUERIES not in the registry: {unknown}")

    t0 = time.perf_counter()
    failures: dict[str, str] = {}
    rows_only: list[str] = []
    for i, name in enumerate(names, 1):
        try:
            pdf = qs[name](spark, sf_dir).toPandas()
            if name in osql:
                assert_frames_match(pdf, con.execute(osql[name]).fetchdf(), name)
                status = "ok"
            else:
                rows_only.append(name)
                status = f"rows-only ({len(pdf)} rows)"
        except Exception as e:  # noqa: BLE001 — sweep must finish the list
            failures[name] = str(e).split("\n")[0][:300]
            status = "FAIL"
        print(f"# [{i}/{len(names)}] {name}: {status}", file=sys.stderr)
    wall = round(time.perf_counter() - t0, 1)

    print(json.dumps({
        "sweep": "full-registry",
        "sf_dir": sf_dir,
        "n_queries": len(names),
        "n_ok": len(names) - len(failures) - len(rows_only),
        "rows_only": rows_only,
        "failures": failures,
        "wall_s": wall,
    }, sort_keys=True))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
