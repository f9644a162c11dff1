from storm_bench_spark.plans.registry import QuerySpec, all_oracles, all_queries, get_spec, register  # noqa: F401
