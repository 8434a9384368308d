"""Portable deterministic hashing primitives.

Every hash the engine uses for dedup/fingerprinting is derived from md5 —
not because md5 is fast, but because it is *bit-identical across engines*
(Spark's ``F.md5`` ≡ DuckDB's ``md5`` ≡ Python's ``hashlib.md5``), which
makes every hash-based operator oracle-checkable. Spark's native
``F.hash``/``F.xxhash64`` are murmur/xxhash with Spark-specific seeds and
have no DuckDB equivalent.

``md5_long`` takes the first 15 hex chars (60 bits) so the value always
fits a signed 64-bit integer — both ``F.conv(...).cast('long')`` and
DuckDB's ``CAST('0x...' AS BIGINT)`` parse it identically.

For throughput-critical paths that don't need cross-engine parity
(e.g. shuffle salting), prefer ``F.xxhash64`` — JVM-side and ~10× faster.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: number of hex chars of the md5 digest used for integer hashes (60 bits)
HEX_CHARS = 15


def md5_long(col: Column) -> Column:
    """60-bit integer hash of a string column (cross-engine portable)."""
    return F.conv(F.substring(F.md5(col), 1, HEX_CHARS), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL rendering of ``md5_long`` (same bits)."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, {HEX_CHARS})) AS BIGINT)"


def seeded(seed: str, col: Column) -> Column:
    """Seeded variant: hash of ``'<seed>|' || value``."""
    return md5_long(F.concat(F.lit(seed + "|"), col))


def seeded_sql(seed: str, expr: str) -> str:
    return md5_long_sql(f"concat('{seed}|', {expr})")
