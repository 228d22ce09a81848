"""Seeded-Laplace noise for deterministic differential-privacy demos.

The mechanism all four DP surfaces share (agg_dp_counts,
agg_dp_quantile, pipeline_privacy_release, stream_dp_release):

  u     = (hash60(seed) % 2^52 + 0.5) / 2^52 - 0.5   in (-0.5, 0.5)\\{0}
  noise = -b * sign(u) * ln(1 - 2|u|)                ~ Laplace(b)

Every step before ``ln`` is exact dyadic-rational arithmetic — the
modulus, the +0.5, and the division by 2^52 are all exact in IEEE
doubles — so ``u`` is bitwise-identical across Spark and DuckDB and
the ``ln`` inputs match to the bit (ln itself is bitwise cross-engine
per the text_bigram_logprob precedent). u is never 0 (that would need
k + 0.5 = 2^51 for integer k) and never ±0.5, so |noise| <=
b * ln(2^51). A production release swaps the content-derived seed for
a secret one; the mechanism, sensitivity accounting, and plan shape
are identical.
"""

from __future__ import annotations

TWO52 = 4503599627370496  # 2^52


def seeded_laplace_sql(seed_expr: str, b_expr: str, hash_fn) -> str:
    """SQL text for one Laplace(b) draw seeded by ``seed_expr``;
    ``hash_fn`` is hash60_spark_sql or hash60_duckdb_sql, which is the
    only dialect difference."""
    u = f"((({hash_fn(seed_expr)}) % {TWO52} + 0.5) / {TWO52} - 0.5)"
    return f"(-({b_expr}) * sign({u}) * ln(1 - 2 * abs({u})))"
