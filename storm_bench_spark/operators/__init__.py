from storm_bench_spark.operators.windows import latest_by, sliding_agg  # noqa: F401
from storm_bench_spark.operators.flightdist import flight_dist_pairs  # noqa: F401
