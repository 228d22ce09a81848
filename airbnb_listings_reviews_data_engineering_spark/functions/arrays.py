"""Vector/array column expressions (embedding math without UDFs).

Dot products and cosines are built from zip_with + aggregate — JVM-side
higher-order functions with strictly sequential accumulation, which makes
them bitwise-reproducible and identical to DuckDB's list_dot_product /
list_cosine_similarity (verified in tests). For very wide vectors a Pandas
UDF over Arrow batches becomes faster; these built-ins win at 64-dim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; matches DuckDB list_cosine_similarity bitwise."""
    return dot(a, b) / (norm(a) * norm(b))
