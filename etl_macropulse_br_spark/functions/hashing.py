"""Portable hashing expressions for dedup / fingerprinting.

Two families:

- **Portable (md5-based)** — bit-identical across Spark and DuckDB,
  so MinHash/SimHash/fingerprint operators can be correctness-gated
  against the SQL oracle. ``md5_long`` maps any string to a signed
  60-bit integer: Spark ``conv(substring(md5(x),1,15),16,10)`` ==
  DuckDB ``CAST('0x'||substring(md5(x),1,15) AS BIGINT)``.
- **Fast (xxhash64)** — Spark's built-in 64-bit hash (JVM, codegen)
  for the scale path where oracle portability is not needed.

Seeded variants prefix the input with ``<seed>:`` so k independent
hash functions come from one primitive (standard MinHash
construction; see Broder 1997, "On the resemblance and containment
of documents").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str, seed: int | None = None) -> Column:
    """String → signed 60-bit integer, portable across engines."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


def md5_long_sql(expr: str, seed: int | None = None) -> str:
    """DuckDB-side twin of :func:`md5_long` (same bits)."""
    inner = f"concat('{seed}:', {expr})" if seed is not None else expr
    return f"CAST(concat('0x', substring(md5({inner}), 1, 15)) AS BIGINT)"


def xxhash64_seeded(col: Column | str, seed: int) -> Column:
    """Fast JVM-side 64-bit hash with a seed column prefix."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.lit(seed), c)
