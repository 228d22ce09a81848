"""Measure the applyInPandasWithState machinery floor: a no-op stateful
function over the same staged micro-batches, logging worker PIDs to see
whether Python workers are re-forked per task/batch."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from airbnb_listings_reviews_data_engineering_spark.session import get_spark  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.plans.streaming_q import (  # noqa: E402
    _ensure_staged,
    _stage_batch,
    _SSA_B1,
    _SSA_B2,
)
from airbnb_listings_reviews_data_engineering_spark.plans.registry import load  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.streaming.ingest import (  # noqa: E402
    run_available_now,
)

sf_dir = "/root/testdata/sf0.1"
spark = get_spark()

ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id")


def _stage(stream_dir):
    b1 = F.lit(_SSA_B1).cast("timestamp")
    b2 = F.lit(_SSA_B2).cast("timestamp")
    batches = [
        ev.filter(F.col("ts") < b1),
        ev.filter((F.col("ts") >= b1) & (F.col("ts") < b2)),
        ev.filter(F.col("ts") >= b2),
    ]
    for seq, b in enumerate(batches, start=1):
        _stage_batch(b.withColumn("bseq", F.lit(seq)), stream_dir, f"batch{seq}.parquet", seq)


stream_dir = _ensure_staged(spark, "ssa_floor_expt", sf_dir, "events", _stage)

PIDLOG = "/tmp/ssa_pids.log"
if os.path.exists(PIDLOG):
    os.remove(PIDLOG)


def noop_fn(key, pdfs, state):
    import os as _os
    import time as _t

    with open(PIDLOG, "a") as f:
        f.write(f"{_os.getpid()} {_t.time():.3f}\n")
    for _ in pdfs:
        pass
    import pandas as pd

    yield pd.DataFrame({"user_id": [key[0]], "n": [0]})


from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: E402

for rep in range(2):
    stream = (
        spark.readStream.schema("event_id bigint, ts timestamp, user_id bigint, bseq int")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .withWatermark("ts", "0 seconds")
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        noop_fn,
        outputStructType="user_id bigint, n bigint",
        stateStructType="x bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    t0 = time.perf_counter()
    run_available_now(out, query_name=f"ssa_floor_{rep}", output_mode="update")
    print(f"rep{rep}: no-op stateful drain {time.perf_counter()-t0:.3f}s", flush=True)

pids = [l.split()[0] for l in open(PIDLOG)]
import collections

c = collections.Counter(pids)
print(f"distinct worker pids: {len(c)}; calls: {len(pids)}; top: {c.most_common(5)}")
