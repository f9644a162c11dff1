import duckdb
import pytest

from storm_bench_spark.session import get_spark
from storm_bench_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


def _duck_cap_gib() -> int:
    """In-suite DuckDB allocator cap: min(24 GiB, 50% of MemTotal).
    On the 128 GiB build box this is the r13 24GB guard against the
    allocation race with the resident Spark JVM; on a smaller box the
    50% term keeps it a real cap (below DuckDB's ~80%-of-RAM default)
    instead of a silent loosening (ADVICE r13). No procfs → 24."""
    try:
        with open("/proc/meminfo") as f:
            for ln in f:
                if ln.startswith("MemTotal:"):
                    total_gib = int(ln.split()[1]) / (1024 * 1024)
                    return max(1, min(24, int(total_gib * 0.5)))
    except OSError:
        pass
    return 24


@pytest.fixture(scope="session")
def spark():
    # codegen.fallback=false (tests only — VERDICT r11 next #7): a
    # janino compile failure (e.g. the 64KB method limit the unrolled
    # dot products tripped in r10) is a HARD error here instead of a
    # silent interpreted 10x; production sessions keep the default
    # graceful fallback.
    s = get_spark(
        app_name="sbs-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.codegen.fallback": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    # Cap the oracle's allocator IN-SUITE only (round 13): DuckDB's
    # default memory_limit is ~80% of RAM, which races the resident
    # Spark JVM for the box's remaining memory — the r7/r12/r13
    # "OutOfMemoryException on one row, clean on isolated re-run"
    # transient (COVERAGE.md). With a hard cap + a spill directory the
    # oracle SPILLS instead of failing allocation. The bench's duck
    # leg (scripts/duck_twin.connect) deliberately keeps the default:
    # capping there could change baseline denominators, and bench
    # pairs have never hit the transient.
    # ADVICE r13: a hard-coded 24GB is HIGHER than DuckDB's default
    # (~80% of RAM) on a sub-30 GB box, silently turning the guard
    # into a loosening there — derive min(24GB, 50% of RAM) instead so
    # the cap stays a cap on any box size.
    con.execute(f"SET memory_limit='{_duck_cap_gib()}GB'")
    con.execute("SET temp_directory='/tmp/duck_spill_pytest'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()
