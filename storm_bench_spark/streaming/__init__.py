from storm_bench_spark.streaming.streams import (  # noqa: F401
    run_to_memory,
    stream_table,
)
