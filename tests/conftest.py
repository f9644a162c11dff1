import duckdb
import pytest

from storm_bench_spark.session import get_spark
from storm_bench_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


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
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duck_spill_pytest'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()
