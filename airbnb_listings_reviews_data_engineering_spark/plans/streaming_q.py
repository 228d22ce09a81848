"""Streaming queries for the driver contract (SURVEY.md §2.8 + extension).

The query runs a REAL Structured Streaming job (file source,
availableNow trigger, memory sink) whose drained result is compared to
the batch-SQL oracle — stream/batch equivalence is the correctness
statement for Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.ingest import read_events_stream, run_available_now, windowed_counts
from .registry import register

_WINDOW_AGG_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, count(*) AS n, round(sum(value), 4) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


@register("stream_window_agg", oracle=_WINDOW_AGG_SQL)
def stream_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation over the events stream,
    drained with trigger(availableNow=True) — equals the batch result."""
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = windowed_counts(events, window="1 hour", watermark="2 hours")
    result = run_available_now(agg, query_name="stream_window_agg")
    return result.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n",
        "sum_value",
    )
