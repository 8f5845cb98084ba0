"""Portable deterministic hashing expressions.

Engine-internal hashing (MinHash, SimHash, fingerprints) is built on
md5 → first 15 hex digits → 60-bit non-negative integer. Unlike
`xxhash64`/`hash`, md5 is available with identical output in Spark,
DuckDB, and Postgres, so every hash-based operator stays oracle-checkable
(the correctness driver replays our SQL in DuckDB).

60 bits keeps values comfortably inside a signed 64-bit long — no
overflow in ANSI mode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: number of leading md5 hex digits used (15 nibbles = 60 bits)
HEX_DIGITS = 15


def md5_long(col: Column) -> Column:
    """md5(col) → non-negative 60-bit LongType."""
    return F.conv(F.substring(F.md5(col), 1, HEX_DIGITS), 16, 10).cast("long")


def seeded_md5_long(col: Column, seed: int) -> Column:
    """Seeded variant: md5(seed || ':' || col) → 60-bit long."""
    return md5_long(F.concat(F.lit(f"{seed}:"), col))


def md5_long_sql(expr: str) -> str:
    """DuckDB-equivalent SQL for `md5_long` (oracle strings)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, {HEX_DIGITS})) AS BIGINT)"


def seeded_md5_long_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"'{seed}:' || {expr}")


# ---------------------------------------------------------------------------
# affine hash family over a 31-bit Mersenne prime (for MinHash etc.)
#
# One md5 per value, then h_i(x) = (A_i * (md5_60(x) mod P) + B_i) mod P.
# Operands stay < 2^31 so products fit signed 64-bit (no ANSI overflow),
# and the identical arithmetic runs in DuckDB for oracle checks.
# ---------------------------------------------------------------------------

MERSENNE_P = 2_147_483_647  # 2^31 - 1


def hash_family_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (A_i, B_i) constants, A_i ∈ [1, P), B_i ∈ [0, P)."""
    params = []
    for i in range(num_hashes):
        a = (1103515245 * (i + 1) + 12345) % MERSENNE_P
        if a == 0:
            a = 1
        b = (2654435761 * i + 1013904223) % MERSENNE_P
        params.append((a, b))
    return params


def base31(col: Column) -> Column:
    """md5-derived base hash reduced into [0, P)."""
    return md5_long(col) % MERSENNE_P


def affine31(base: Column, a: int, b: int) -> Column:
    return (base * F.lit(a) + F.lit(b)) % MERSENNE_P


def base31_sql(expr: str) -> str:
    return f"({md5_long_sql(expr)} % {MERSENNE_P})"


def affine31_sql(base_expr: str, a: int, b: int) -> str:
    return f"(({base_expr} * {a} + {b}) % {MERSENNE_P})"
