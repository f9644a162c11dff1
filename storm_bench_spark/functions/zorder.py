"""Morton (Z-order) interleave — multi-dimensional clustering math.

One bit-position table drives BOTH renderings (a Spark ``Column`` and a
DuckDB SQL fragment), so the engine and the oracle cannot drift: each
of the 16 low bits of x lands at even position 2i, each of y at odd
position 2i+1, giving a 32-bit z-value whose lexicographic order is the
Z-curve over (x, y).

Why this is a first-class 100 TB function and not a toy: sorting (in
Spark, ``repartitionByRange`` + ``sortWithinPartitions``) by z before a
parquet/Iceberg/Delta write makes the per-file min/max column stats
tight in BOTH dimensions at once, so a predicate on either column — or
both — prunes files. A single-column sort gives pruning on one
dimension only; Z-order is how lakehouse tables get two-dimensional
file skipping without storing the data twice.

Everything here is integer bit math on BIGINT — deterministic,
whole-stage-codegen'd JVM expressions on the Spark side, the literal
same arithmetic in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZORDER_BITS = 16  # per-dimension input width; z fits in 32 bits
ZORDER_MASK = (1 << ZORDER_BITS) - 1


def morton32(x: Column, y: Column) -> Column:
    """32-bit Z-value of two 16-bit dims (callers mask with
    ``ZORDER_MASK`` first). Pure column expression — one codegen'd
    stage, no UDF."""
    z: Column | None = None
    for i in range(ZORDER_BITS):
        tx = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ty = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = tx.bitwiseOR(ty)
        z = term if z is None else z.bitwiseOR(term)
    assert z is not None
    return z


def morton32_sql(x: str, y: str) -> str:
    """The identical interleave as a DuckDB SQL expression over column
    (or expression) strings ``x`` and ``y`` — generated from the same
    loop bounds as :func:`morton32` so the two renderings are one
    spec. Inputs are cast to BIGINT first: a 32-bit INTEGER operand
    would make DuckDB evaluate the shifts in INTEGER and raise on
    ``<< 31``."""
    x = f"CAST({x} AS BIGINT)"
    y = f"CAST({y} AS BIGINT)"
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def morton32_py(x: int, y: int) -> int:
    """Driver-side reference (tests only): the same interleave in plain
    Python, used to pin both renderings against an independent spelling."""
    z = 0
    for i in range(ZORDER_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z
