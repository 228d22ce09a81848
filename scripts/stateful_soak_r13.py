"""State-bound soak for the keyed-admission timer operator (round 13).

The 100 TB claim of stream_stateful_admission is that EVENT-TIME-TIMER
TTL expiry keeps the state store FINITE on an unbounded key space: a
user idle past the gap is dropped from state, so state tracks the
RECENTLY-ACTIVE key set, not every key ever seen. This soak drives the
operator over {batches} micro-batches of CHURNING users (each batch
introduces a fresh cohort and advances event time by one day; old
cohorts go idle) and reads the per-batch state-store row counts from
the streaming progress events.

PASS = total users seen grows linearly with batches while
stateOperators.numRowsTotal PLATEAUS at ~the live-cohort size (the last
two batches' users — one day's TTL at one-day batch steps), with
numRowsRemoved > 0 showing the timers actually evicting.

Usage: python scripts/stateful_soak_r13.py
Committed log: scripts/stateful_soak_r13.log (SCALING.md quotes numbers
only with a committed raw log).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from airbnb_listings_reviews_data_engineering_spark.plans.streaming_q import (  # noqa: E402
    _stage_batch,
)
from airbnb_listings_reviews_data_engineering_spark.session import get_spark  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.sources.staging import (  # noqa: E402
    staging_root,
)
from airbnb_listings_reviews_data_engineering_spark.streaming.ingest import (  # noqa: E402
    stateful_admission,
)

BATCHES = 12
COHORT = 30          # users entering per batch
OVERLAP = 10         # users shared with the previous batch
DAY_S = 86_400


def main() -> int:
    spark = get_spark(app_name="ssa-soak", cpus=8, shuffle_partitions=8)
    root = os.path.join(staging_root(spark), "ssa_soak_r13")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    stream_dir = os.path.join(root, "in")
    os.makedirs(stream_dir)

    seen_users: set[int] = set()
    eid = 0
    for b in range(BATCHES):
        base = b * (COHORT - OVERLAP)
        users = list(range(base, base + COHORT))
        seen_users.update(users)
        rows = []
        for u in users:
            for j in range(3):  # 3 events per active user per batch
                eid += 1
                rows.append((eid, b * DAY_S + u * 7 + j * 11 + 1000, u))
        pdf = pd.DataFrame(rows, columns=["event_id", "epoch", "user_id"])
        df = spark.createDataFrame(pdf).select(
            "event_id",
            F.timestamp_seconds("epoch").alias("ts"),
            "user_id",
            F.lit(b + 1).alias("bseq"),
        )
        _stage_batch(df, stream_dir, f"batch{b:02d}.parquet", b)

    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, bseq int"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .withWatermark("ts", "0 seconds")
    )
    out = stateful_admission(
        stream,
        gap_ms=DAY_S * 1000,
        cap=3,
        fired_bseq_bounds_ms=(0, 0),
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("ssa_soak_r13")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print(f"{'batch':>5} {'inRows':>7} {'stateRows':>9} {'removed':>8}")
    state_rows = []
    removed_total = 0
    for i, prog in enumerate(q.recentProgress):
        ops = prog["stateOperators"]
        if not ops:
            continue
        n = ops[0]["numRowsTotal"]
        rm = ops[0]["numRowsRemoved"]
        removed_total += rm
        state_rows.append(n)
        print(
            f"{i:>5} {prog['numInputRows']:>7} {n:>9} {rm:>8}"
        )
    plateau = max(state_rows[-4:])
    print(
        f"users_seen_total={len(seen_users)} state_plateau={plateau} "
        f"removed_total={removed_total}"
    )
    ok = (
        plateau <= 2 * COHORT  # live cohorts only, not all users ever
        and removed_total > 0
        and len(seen_users) > 3 * plateau
    )
    print("SOAK " + ("PASS" if ok else "FAIL") + ": state plateaus at the "
          "live-cohort size while total users grow linearly"
          if ok else "SOAK FAIL")
    shutil.rmtree(root, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
