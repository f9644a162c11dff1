"""Column-expression library.

Every function here returns a pyspark Column built from JVM-side
built-ins (whole-stage-codegen friendly). No Python UDFs on this path.
"""

from storm_bench_spark.functions.text import (  # noqa: F401
    extract_hashtags,
    lang_scores,
    quality_features,
    token_count,
    word_split,
)
from storm_bench_spark.functions.geo import (  # noqa: F401
    dead_reckon_lat,
    dead_reckon_lng,
    haversine_km,
    zone_index,
)
from storm_bench_spark.functions.hashing import hash64, minhash_perm  # noqa: F401
from storm_bench_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
from storm_bench_spark.functions.parsers import (  # noqa: F401
    parse_adsb,
    parse_pageview,
    parse_tweet_text,
)
