"""Funnel-order edge cases: the chain must be strictly ordered
(click before the first view doesn't count), resolved in one shuffle."""

from __future__ import annotations

import datetime as dt

from airbnb_listings_reviews_data_engineering_spark.plans.analytics_ext import (
    funnel_stages,
)


def _events(spark, rows):
    # (event_id, user_id, event_type, minute-offset)
    base = dt.datetime(2024, 1, 1)
    data = [
        (eid, base + dt.timedelta(minutes=m), uid, et, 1.0, "{}")
        for eid, uid, et, m in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _stages(spark, tmp_path, rows):
    df = _events(spark, rows)
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    return {r.stage: r.n_users for r in funnel_stages(spark, sf).collect()}


def test_funnel_full_conversion_and_wrong_order(spark, tmp_path):
    rows = [
        # user 1: view -> click -> purchase (stage 3)
        (1, 1, "view", 0), (2, 1, "click", 5), (3, 1, "purchase", 10),
        # user 2: click BEFORE first view, never after -> stage 1 only
        (4, 2, "click", 0), (5, 2, "view", 5),
        # user 3: purchase before click completes the chain? no — purchase
        # at t=6 is after the click at t=4 which is after view -> stage 3
        (6, 3, "view", 0), (7, 3, "purchase", 6), (8, 3, "click", 4),
        # user 4: only errors -> stage 0
        (9, 4, "error", 0),
    ]
    out = _stages(spark, tmp_path, rows)
    assert out == {3: 2, 1: 1, 0: 1}


def test_funnel_strictness_ties_do_not_advance(spark, tmp_path):
    # click at the SAME minute as view: strict > excludes it
    rows = [(1, 1, "view", 0), (2, 1, "click", 0)]
    out = _stages(spark, tmp_path, rows)
    assert out == {1: 1}
