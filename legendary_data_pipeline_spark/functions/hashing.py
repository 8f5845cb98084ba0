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
