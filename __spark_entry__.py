"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the package; this module is a thin adapter over
``airbnb_listings_reviews_data_engineering_spark.plans.all_queries()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from airbnb_listings_reviews_data_engineering_spark.plans import all_queries

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 3-way star join +
    revenue aggregation (SURVEY.md §2.4 join_eq3 — the reference's Q2-Q4
    join pattern)."""
    return all_queries()["join_eq3"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {key: spec.fn for key, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the few
    non-SQL-expressible ops -> driver records a rows-only check)."""
    return {
        key: spec.oracle
        for key, spec in all_queries().items()
        if spec.oracle is not None
    }
