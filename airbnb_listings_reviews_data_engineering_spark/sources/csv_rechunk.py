"""Splittable ingest for multiLine CSV (VERDICT r2 "Next round" #5).

``multiLine`` CSV (quoted fields with embedded newlines — the real
listings dump, airbnb/etl.py) cannot be split inside a file: record
boundaries are not recognizable mid-stream, so ONE task parses each
file, and a 1 TB single-file dump parses on one core. The scale path is
a re-chunk pre-pass: parse the CSV once (per-file tasks — the one-time
unavoidable cost), repartition, and land it as parquet under the
configurable staging root. Every downstream read then gets splittable,
columnar, predicate-pushdown-able input at full cluster parallelism —
the "land raw CSV into the lake once" pattern a 100 TB ingest uses
anyway.

Idempotence: the staged parquet is published through the atomic
version layer (sources/atomic.py), so a crashed re-chunk never leaves a
half-written staging dir visible, and re-running after a crash is safe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .atomic import publish_parquet, read_published
from .staging import staging_root


def rechunk_multiline_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    *,
    stage_key: str,
    partitions: int | None = None,
    header: bool = True,
    quote: str = '"',
    escape: str = '"',
    refresh: bool = True,
) -> DataFrame:
    """Parse a multiLine CSV once, stage it as parquet, return the
    splittable staged DataFrame.

    ``stage_key`` names the staging subdirectory (one per logical
    dataset). ``refresh=False`` reuses an existing staged version
    without re-parsing (the daily-ingest shape: re-chunk on landing,
    read many times). ``escape='"'`` is RFC-4180 doubled-quote escaping
    — Spark's default backslash escape mis-parses ``"{TV,""Cable
    TV""}"`` (airbnb/etl.py:46-60).
    """
    target = os.path.join(staging_root(spark), "csv_rechunk", stage_key)
    if not refresh:
        existing = read_published(spark, target)
        if existing is not None:
            return existing
    reader = (
        spark.read.option("header", header)
        .option("multiLine", True)
        .option("quote", quote)
        .option("escape", escape)
    )
    raw = reader.csv(path, schema=schema) if schema is not None else reader.csv(path)
    n = partitions or spark.sparkContext.defaultParallelism
    # round-robin repartition: the single-task parse output spreads over
    # n parquet files, so downstream scans split even if the source was
    # ONE giant CSV file
    publish_parquet(raw.repartition(n), target)
    return read_published(spark, target)
