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
    # seeds 8..31: splitmix64-style odd constants truncated to 15 hex
    # digits — enough permutations for a 32-hash/16-band S-curve
    # (scripts/dedup_quality.py measures what the larger budget buys)
    0x7F4A7C15F39CC06,
    0x1CE4E5B9E3779B9,
    0x133111EB5586CCA,
    0x6659FD94D049BB1,
    0x5A5A5A5D6E8FEB8,
    0x9ABCDEFA5A5A5A5,
    0x7654321123456FE,
    0x0F1E2D3C4B5A697,
    0x8899AABBCCDDEEF,
    0x1F2E3D4C5B6A798,
    0x02468ACE13579BD,
    0xBD9F86427531ECA,
    0x5DEECE66D2B79F1,
    0x2545F4914F6CDD1,
    0x9E6C58D1B9F87A3,
    0x41C64E6D3039FFF,
    0x6C078965254DEAD,
    0x3C6EF372FE94F82,
    0xA54FF53A5F1D36F,
    0x510E527FADE682D,
    0x9B05688C2B3E6C1,
    0x1F83D9ABFB41BD6,
    0x5BE0CD19137E217,
    0x71374491B5C0FBC,
)
