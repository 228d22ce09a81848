"""Experiment: drain wall vs shuffle-partition count for the
keyed-state streaming keys (guide §1 empirical loop). Not part of the
bench — exploration only."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from airbnb_listings_reviews_data_engineering_spark.session import get_spark  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.plans import all_queries  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.checkpoint import release_pins  # noqa: E402

KEY = sys.argv[1] if len(sys.argv) > 1 else "stream_stateful_admission"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark()
qs = all_queries()

# warm once
qs[KEY].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
release_pins(spark)

for parts in (32, 16, 8, 4):
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        qs[KEY].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        release_pins(spark)
    print(f"partitions={parts}: best {best:.3f}s", flush=True)
spark.conf.set("spark.sql.shuffle.partitions", "32")
