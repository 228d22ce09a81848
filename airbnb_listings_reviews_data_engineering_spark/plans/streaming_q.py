"""Streaming queries for the driver contract (SURVEY.md §2.8 + extension).

The query runs a REAL Structured Streaming job (file source,
availableNow trigger, memory sink) whose drained result is compared to
the batch-SQL oracle — stream/batch equivalence is the correctness
statement for Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.ingest import (
    read_events_stream,
    run_available_now,
    session_windows,
    stateful_user_stats,
    windowed_counts,
)
from .registry import load, register

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


_SESSION_WINDOW_SQL = """
WITH g AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM s GROUP BY user_id, sid
"""


@register("stream_session_window", oracle=_SESSION_WINDOW_SQL)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session_window (30-min gap) per user, drained with
    availableNow. Oracle = the batch lag/running-sum sessionization with
    the same half-open boundary (new session when gap >= 30 min) — the
    stream/batch equivalence statement for session windows."""
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = session_windows(events, gap="30 minutes", watermark="2 hours")
    result = run_available_now(agg, query_name="stream_session_window")
    return result.select(
        "user_id",
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
        "sum_value",
    )


_STATEFUL_SQL = """
SELECT user_id, count(*) AS n_events, max(value) AS max_value
FROM events GROUP BY user_id
"""


@register("stream_stateful_stats", oracle=_STATEFUL_SQL)
def stream_stateful_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    running per-user count + max. Drained availableNow in update mode;
    with the whole file as one batch each key emits its final state, which
    must equal the batch GROUP BY — the correctness statement for
    arbitrary stateful processing."""
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    stats = stateful_user_stats(events)
    return run_available_now(
        stats, query_name="stream_stateful_stats", output_mode="update"
    )


_STREAM_STREAM_SQL = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       round(p.value, 4) AS purchase_value
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
"""


@register("stream_stream_join", oracle=_STREAM_STREAM_SQL)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join: clicks joined to the same
    user's purchases within the following hour. Both sides carry
    watermarks and the join has a two-sided time bound, so state is
    evictable — the shape that runs forever on an unbounded stream.
    Drained availableNow; the oracle is the equivalent batch interval
    join (stream/batch equivalence again)."""
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (purchases.p_user == clicks.user_id)
        & (purchases.p_ts >= clicks.click_ts)
        & (purchases.p_ts <= clicks.click_ts + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        F.round("value", 4).alias("purchase_value"),
    )
    return run_available_now(
        joined, query_name="stream_stream_join", output_mode="append"
    )


_STREAM_DEDUP_SQL = """
SELECT event_id, user_id, event_type FROM events WHERE event_id % 11 = 0
"""


@register("stream_dedup", oracle=_STREAM_DEDUP_SQL)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup: the same file read as TWO streams and
    unioned (every event duplicated), then dropDuplicates on event_id
    within the watermark — the exactly-once guard for at-least-once
    sources. Result equals the batch DISTINCT."""
    path = f"{sf_dir}/events.parquet"
    a = read_events_stream(spark, path)
    b = read_events_stream(spark, path)
    dup = a.unionByName(b).filter(F.col("event_id") % 11 == 0)
    deduped = (
        dup.withWatermark("ts", "2 hours")
        .dropDuplicates(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    return run_available_now(
        deduped, query_name="stream_dedup", output_mode="append"
    )


_STREAM_STATIC_SQL = """
SELECT c.c_mktsegment AS segment, count(*) AS n_events,
       round(sum(e.value), 4) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("stream_static_join", oracle=_STREAM_STATIC_SQL)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    customer dimension (broadcast per micro-batch — no stream state), then
    aggregated per segment."""
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = events.join(F.broadcast(cust), events.user_id == cust.c_custkey)
    agg = joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value")
    )
    return run_available_now(agg, query_name="stream_static_join")
