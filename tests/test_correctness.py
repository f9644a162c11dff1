"""The local twin of the driver's correctness gate: every registered
query with an oracle runs on Spark AND DuckDB at sf0.001; results must
match on columns, row count, and values."""

import pytest
from pyspark.sql.types import AtomicType

from storm_bench_spark.plans.registry import all_oracles, all_queries
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_frames_match

ORACLES = all_oracles()
QUERIES = all_queries()


def _assert_scalar_schema(df, name):
    # Gate-compatibility invariant: the driver's canonicalizer sorts
    # result columns with pandas, which cannot hash/factorize array or
    # struct cells (the round-4 embedding_project failure). Every
    # driver-checked result must therefore be all-scalar; wide values
    # go long-form (posexplode) instead.
    bad = [f"{f.name}: {f.dataType.simpleString()}"
           for f in df.schema.fields if not isinstance(f.dataType, AtomicType)]
    assert not bad, (
        f"{name}: non-scalar driver-visible column(s) {bad} — emit long "
        f"form (posexplode) so the gate canonicalizer can hash the result"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    _assert_scalar_schema(df, name)
    sdf = df.toPandas()
    ddf = duck.execute(ORACLES[name]).fetchdf()
    assert_frames_match(sdf, ddf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_queries_without_oracle_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    _assert_scalar_schema(df, name)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
