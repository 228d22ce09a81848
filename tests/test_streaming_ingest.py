"""End-to-end test of the Structured Streaming incremental ingest:
drop-directory CSV batches -> availableNow drain -> foreachBatch MERGE
into a parquet target — the reference's daily-rerun semantics
(inc_daily_snapshot + inc_retry, SURVEY.md §2.8) without a coordinator."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from airbnb_listings_reviews_data_engineering_spark.streaming.ingest import (
    available_now_merge_ingest,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("city", T.StringType()),
        T.StructField("price", T.DoubleType()),
    ]
)


def _write_batch(path: str, rows: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("id,city,price\n" + rows)


def test_incremental_merge_ingest(spark, tmp_path):
    src = str(tmp_path / "drop")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    _write_batch(f"{src}/day1.csv", "1,DC,100.0\n2,MD,200.0\n")
    out1 = available_now_merge_ingest(
        spark, src, SCHEMA, target, keys=["id"], checkpoint=ckpt
    )
    assert {(r.id, r.price) for r in out1.collect()} == {(1, 100.0), (2, 200.0)}

    # day 2: id=2 updated, id=3 new — updates win, old rows survive
    _write_batch(f"{src}/day2.csv", "2,MD,250.0\n3,VA,300.0\n")
    out2 = available_now_merge_ingest(
        spark, src, SCHEMA, target, keys=["id"], checkpoint=ckpt
    )
    assert {(r.id, r.price) for r in out2.collect()} == {
        (1, 100.0),
        (2, 250.0),
        (3, 300.0),
    }

    # re-run with no new files: checkpoint skips everything — idempotent
    out3 = available_now_merge_ingest(
        spark, src, SCHEMA, target, keys=["id"], checkpoint=ckpt
    )
    assert {(r.id, r.price) for r in out3.collect()} == {
        (1, 100.0),
        (2, 250.0),
        (3, 300.0),
    }
