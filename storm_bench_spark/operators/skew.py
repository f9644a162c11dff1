"""Skew-handling operators: salted joins and salted aggregation.

AQE's skew-join splitting (on in session.py) covers sort-merge joins at
runtime; these operators are the explicit, plan-level tools for the
cases AQE can't see — a hot key in a shuffle aggregation, or a
broadcast-ineligible dimension joined on a skewed fact key.

Salting trades one shuffle's skew for ``n_salt``× replication of the
small side: fact rows scatter across ``n_salt`` sub-keys, the dim side
replicates to every sub-key, and the hot key's work spreads over
``n_salt`` tasks instead of one straggler.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated.

    Results equal ``fact.join(dim, on, how)`` for inner/left joins; the
    salt spreads each join key over ``n_salt`` shuffle partitionings.
    The salt is derived from a hash of the fact row, so the assignment
    is deterministic per row content (duplicate rows share a salt —
    acceptable: correctness never depends on the salt value).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salt))
    f = fact.withColumn(_SALT, salt)
    d = dim.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return f.join(d, [*on, _SALT], how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salt: int = 8,
) -> DataFrame:
    """Two-stage aggregation through a salted sub-key.

    Stage 1 aggregates on (keys, salt) — the hot key's rows split over
    ``n_salt`` reducers; stage 2 merges the ``n_salt`` partials per key.
    Requires a decomposable aggregate (count→sum, sum→sum, min/max→
    min/max, sketch→union), same contract as ``sliding_agg_twophase``.

    Note Spark's hash aggregation already does map-side partials, which
    handles most skew; reach for this when the number of *distinct*
    values under the hot key overwhelms a single final-stage reducer.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    stage1 = df.withColumn(_SALT, salt).groupBy(*keys, _SALT).agg(*partial_aggs)
    return stage1.groupBy(*keys).agg(*final_aggs)
