"""Query registry: every engine capability is a named (DataFrame, oracle) pair.

The driver contract (``__spark_entry__.py``) needs ``queries()`` and
``oracle_sql()`` dicts; this registry is their single source of truth.
Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable plus
an optional DuckDB oracle SQL string with IDENTICAL output column names
(the driver sorts columns by name before hashing).

Queries with ``oracle=None`` are non-SQL-expressible (custom stateful
streaming etc.) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import side-effect modules once, on first registry access.
    import storm_bench_spark.plans.topologies  # noqa: F401
    import storm_bench_spark.plans.tpch  # noqa: F401
    import storm_bench_spark.plans.pipeline  # noqa: F401
    import storm_bench_spark.plans.streaming_queries  # noqa: F401
    import storm_bench_spark.plans.dedup_queries  # noqa: F401
    import storm_bench_spark.plans.library_ops  # noqa: F401
    import storm_bench_spark.plans.relational  # noqa: F401
    import storm_bench_spark.plans.curation  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None}


def get_spec(name: str) -> QuerySpec:
    _ensure_loaded()
    return _REGISTRY[name]
