"""Vector column functions over ``array<float>`` embedding columns.

Pure higher-order-function expressions (``F.zip_with`` + ``F.aggregate``)
so similarity math stays JVM-side; no Python crossing for the
brute-force path. A vectorized Pandas-UDF alternative exists in
``operators/similarity.py`` for workloads where NumPy BLAS beats
codegen (wide vectors), selectable per query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a, b) -> Column:
    """Dot product of two equal-length numeric array columns."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a) -> Column:
    v = _c(a)
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a, b) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    a, b = _c(a), _c(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))
