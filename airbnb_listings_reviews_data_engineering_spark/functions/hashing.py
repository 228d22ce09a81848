"""Deterministic cross-engine hashing.

MinHash/SimHash need a 64-bit-ish integer hash that Spark and the DuckDB
oracle compute IDENTICALLY. Neither engine's native hash qualifies (Spark
= Murmur3/xxhash64, DuckDB = its own), so the engine derives a 60-bit
integer from the first 15 hex chars of md5 — verified bitwise-equal:

  Spark :  cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)
  DuckDB:  CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

60 bits < 63, so the value is a non-negative BIGINT on both sides. md5 is
fine here: this is content fingerprinting, not security.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column | str) -> Column:
    """60-bit non-negative integer hash of a string column (md5-derived)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash60_spark_sql(expr: str) -> str:
    """Spark SQL text form of :func:`hash60` (for use in expr strings)."""
    return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"


def hash60_duckdb_sql(expr: str) -> str:
    """DuckDB SQL text computing the identical value."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# XOR permutation seeds for the MinHash family: h_j(x) = hash60(x) XOR seed.
# XOR by a constant is a bijection on the 60-bit hash space, so each seed
# yields a valid permutation while md5 runs ONCE per shingle instead of
# once per (shingle, permutation) — ~8x less hashing on the hot path.
# All seeds are 15 hex digits (< 2^60) so results stay non-negative.
XOR_SEEDS = (
    0x000000000000000,
    0x9E3779B97F4A7C1,
    0xBF58476D1CE4E5B,
    0x94D049BB133111E,
    0xD6E8FEB86659FD9,
    0xA5A5A5A5A5A5A5A,
    0x123456789ABCDEF,
    0xFEDCBA987654321,
)
