"""SparkSession factory tuned for this engine.

Local mode is a correctness/dev harness; the conf is written so the same
code scales to a multi-executor cluster: AQE on (runtime coalesce + skew
join), shuffle partitions sized to the parallelism at hand, UTC session
timezone (required for DuckDB-oracle comparison — DuckDB timestamps are
UTC-naive), Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "airbnb-spark-engine",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a real
    cluster the ``master`` is supplied externally; local[] is only the
    test harness.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or max(cpus, 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalescing sizes partitions by BYTES; with the default 1m
        # floor a few-MB shuffle coalesces to 1-3 partitions and every
        # post-shuffle compute-heavy stage (md5 position streams, GD
        # rounds, label-prop) runs near-serial on this harness. With
        # parallelismFirst (default true) AQE caps partitions at
        # defaultParallelism, so the floor only matters for small
        # shuffles: 16k keeps those stages parallel while a production
        # shuffle (total bytes >> parallelism * advisory size) is sized
        # by bytes exactly as before. Measured: 12 mixed keys 16.5 s ->
        # 12.7 s at sf0.1 (OPTIMIZATION_r13.md); scale-parameterized.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "16k"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16g: local mode puts every "executor" in the driver JVM; an 8g
        # heap GC-thrashes the localCheckpoint-heavy dedup paths at the
        # 100x scale smoke (20.2s -> 10.1s for the LSH stage, SCALING.md)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Local-harness split size: the sf0.1 tables are single sub-16MB
        # parquet files, so the cluster default (128m) leaves every scan
        # stage at parallelism 1 and serializes compute-heavy scans
        # (md5-per-shingle in the dedup family). 512k splits them across
        # the 32 local cores; a real cluster reading 100 TB keeps the
        # 128m default (set SPARK_GRAFT_MAX_PARTITION_BYTES).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "512k"),
        )
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
