"""Parquet source/sink — the engine's canonical storage.

Replaces the reference's Postgres heap tables + BSON documents with
columnar storage: vectorized reads, min/max pruning, column pruning.
The B-tree-on-id indexes (sql/create_*.sql) map to optional bucketBy,
which pre-shuffles the repeated id-joins away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame, name: str, bucket_col: str, num_buckets: int = 32
) -> None:
    """Bucketed managed table: co-locates later equi-joins on bucket_col
    (the Spark analog of the reference's per-table id index)."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(name)
    )


def compact_published(
    spark: SparkSession, target_path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> tuple[int, int]:
    """Small-files compaction for an atomically-published table.

    The operational reality of incremental ingest at scale: every
    micro-batch/daily merge leaves another wave of files, and a 100 TB
    table read through 10-million 1 MB files is NameNode/S3-listing- and
    task-scheduling-bound, not IO-bound. Compaction rewrites the current
    version into ceil(bytes / target_file_bytes) files of ~HDFS-block
    size — as a NEW atomic version (sources/atomic.py), so concurrent
    readers of the old version are untouched and a mid-compaction crash
    publishes nothing.

    Returns (files_before, files_after). This is what OPTIMIZE does on
    Delta/Iceberg; coalesce() (no shuffle) does the merge here because
    compaction must not pay a full re-shuffle of the table.
    """
    import math
    import os

    from .atomic import current_version, publish_parquet, read_published

    version = current_version(target_path)
    if version is None:
        raise ValueError(f"nothing published at {target_path}")
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(version)
        for f in fs
        if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = read_published(spark, target_path)
    publish_parquet(df.coalesce(n_out), target_path)
    new_version = current_version(target_path)
    n_after = sum(
        1 for _, _, fs in os.walk(new_version) for f in fs if f.endswith(".parquet")
    )
    return len(files), n_after
