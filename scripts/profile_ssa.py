"""Profile the keyed-state streaming drains: per-micro-batch durationMs
breakdown from StreamingQueryProgress, to attribute the ~4.4 s drain
(guide §1 — measure first; the drain is opaque to the SQL-tab plan)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from airbnb_listings_reviews_data_engineering_spark.session import get_spark  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.plans import all_queries  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.checkpoint import release_pins  # noqa: E402

KEY = sys.argv[1] if len(sys.argv) > 1 else "stream_stateful_admission"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark()
qs = all_queries()

# monkey-patch run_available_now to capture the query object's progress
import airbnb_listings_reviews_data_engineering_spark.streaming.ingest as ing

orig = ing.run_available_now
progress_log: list = []


def patched(agg, query_name=None, output_mode="complete"):
    import uuid, tempfile

    name = query_name or f"stream_{uuid.uuid4().hex[:8]}"
    checkpoint = os.path.join(
        tempfile.gettempdir(), "airbnb_spark_ckpt", f"{name}_{uuid.uuid4().hex[:8]}"
    )
    t0 = time.perf_counter()
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress_log.append((time.perf_counter() - t0, [json.loads(p.json) for p in q.recentProgress]))
    return agg.sparkSession.sql(f"SELECT * FROM {name}")


ing.run_available_now = patched
import airbnb_listings_reviews_data_engineering_spark.plans.streaming_q as sq

sq.run_available_now = patched

for rep in range(3):
    t0 = time.perf_counter()
    qs[KEY].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"rep{rep}: total {time.perf_counter()-t0:.3f}s")
    release_pins(spark)

wall, progs = progress_log[-1]
print(f"last drain wall: {wall:.3f}s over {len(progs)} progress entries")
for p in progs:
    d = p.get("durationMs", {})
    so = p.get("stateOperators", [])
    so_ms = [
        {
            k: o.get(k)
            for k in (
                "numRowsTotal",
                "numRowsUpdated",
                "allUpdatesTimeMs",
                "commitTimeMs",
                "numShufflePartitions",
            )
        }
        for o in so
    ]
    print(
        f"batch {p.get('batchId')}: rows={p.get('numInputRows')} "
        f"durations={d} state={so_ms}"
    )
