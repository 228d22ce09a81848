"""Structured Streaming re-expression of the reference's incremental runs.

The reference's 'streaming' is a daily Airflow re-run with DB-side upsert
(Airbnb_Listings_ETL.py:229, Airbnb_Review_ETL.py:132). The Spark-native
equivalent is a file-source stream with trigger(availableNow=True):
each run drains whatever new files landed, foreachBatch merges them
idempotently, and checkpointing gives exactly-once — retries come free
(inc_retry, SURVEY.md §2.8).

Also provides a watermarked tumbling-window aggregation — the streaming
operator a production events pipeline needs that the reference lacks.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # stored as INT64 TIMESTAMP(NANOS): read as nanos-long, convert below
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the events parquet (explicit schema —
    streaming sources never infer).

    The file source wants a directory; when given a single parquet file,
    stage a symlink directory around it (zero copy).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if path.endswith(".parquet") and os.path.isfile(path):
        d = os.path.join(
            tempfile.gettempdir(), "airbnb_spark_stream", path.strip("/").replace("/", "_")
        )
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, "part-0.parquet")
        if not os.path.exists(link):
            os.symlink(path, link)
        path = d
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return stream.withColumn(
        "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)"))
    )


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window count+sum per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def run_available_now(agg: DataFrame, query_name: str | None = None) -> DataFrame:
    """Drain the stream synchronously into a memory sink and return the
    final result as a batch DataFrame (complete mode so every window,
    including the last open one, is emitted)."""
    spark = agg.sparkSession
    name = query_name or f"stream_{uuid.uuid4().hex[:8]}"
    # fresh checkpoint per run: the memory sink has no recovery story
    checkpoint = os.path.join(
        tempfile.gettempdir(), "airbnb_spark_ckpt", f"{name}_{uuid.uuid4().hex[:8]}"
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")
