"""Portable deterministic hashing for dedup/sketch operators.

The dedup/minhash/simhash operators must be verifiable by a DuckDB
oracle, so the hash has to be identical in both engines. We derive a
60-bit integer from md5 (both engines implement RFC-1321 md5 on UTF-8
bytes):

    Spark:  CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)

MinHash permutations are the classic universal-hash family
``(a_i * h + b_i) mod p`` over the Mersenne prime 2^31 - 1, with fixed
(seeded) odd constants — 64-bit intermediate products stay in range.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_31 = 2_147_483_647  # 2^31 - 1

# Fixed permutation constants (seed 42, generated once; plain data).
def _perm_constants(n: int) -> list[tuple[int, int]]:
    # Deterministic LCG so Spark code, oracle SQL, and tests agree
    # without sharing state: x_{k+1} = (x_k * 6364136223846793005 + 1442695040888963407) mod 2^63.
    out = []
    x = 42
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (x % (MERSENNE_31 - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % MERSENNE_31
        out.append((a, b))
    return out


PERMS_64 = _perm_constants(64)


def hash64(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column (md5-derived, non-negative)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str) -> str:
    """DuckDB rendering of ``hash64`` for oracle SQL composition."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_perm(h: Column, perm_index: int) -> Column:
    """The ``perm_index``-th universal-hash permutation of a hash64 value."""
    a, b = PERMS_64[perm_index]
    return (h % MERSENNE_31 * a + b) % MERSENNE_31


def minhash_perm_sql(hexpr: str, perm_index: int) -> str:
    a, b = PERMS_64[perm_index]
    return f"((({hexpr}) % {MERSENNE_31}) * {a} + {b}) % {MERSENNE_31}"
