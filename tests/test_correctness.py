"""The local twin of the driver's correctness gate: every registered
query with an oracle runs on Spark AND DuckDB at sf0.001; results must
match on columns, row count, and values."""

import pytest

from storm_bench_spark.plans.registry import all_oracles, all_queries
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_frames_match

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(ORACLES[name]).fetchdf()
    assert_frames_match(sdf, ddf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_queries_without_oracle_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
