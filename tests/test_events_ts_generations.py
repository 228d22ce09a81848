"""The driver's events.parquet has shipped in two physical shapes across
testdata generations: INT64 TIMESTAMP(NANOS) (round 1) and plain
TIMESTAMP(MICROS) without UTC adjustment (round 2, reads as
TIMESTAMP_NTZ). Both the batch loader (plans.registry.load) and the
streaming file source (streaming.ingest.read_events_stream) must
normalize either shape to the same session-UTC TIMESTAMP values — a
silent mis-scale here collapses every window to 1970 (the round-2 gate
regression this file pins).
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from airbnb_listings_reviews_data_engineering_spark.plans.registry import load
from airbnb_listings_reviews_data_engineering_spark.streaming.ingest import (
    events_ts_is_nanos_long,
    read_events_stream,
    run_available_now,
)

_ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 1, 500000), 10, "click", 1.5, "{}"),
    (2, datetime.datetime(2024, 1, 1, 12, 30, 0, 250), 11, "view", 2.0, "{}"),
    (3, datetime.datetime(2024, 1, 30, 23, 59, 59, 999999), 10, "purchase", 3.25, "{}"),
]


def _write_events(tmpdir: str, unit: str) -> str:
    """Write the fixture rows as events.parquet with ts in the given
    parquet physical unit ('ns' -> INT64 TIMESTAMP(NANOS), 'us' ->
    TIMESTAMP(MICROS), both unadjusted-to-UTC like the driver's files)."""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in _ROWS], pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS], pa.string()),
        }
    )
    path = f"{tmpdir}/events.parquet"
    # version 2.6 keeps NANOS as NANOS instead of coercing to micros
    pq.write_table(table, path, version="2.6", coerce_timestamps=None)
    return path


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_batch_load_normalizes_both_generations(spark, tmp_path, unit):
    d = tmp_path / unit
    d.mkdir()
    path = _write_events(str(d), unit)
    assert events_ts_is_nanos_long(path) == (unit == "ns")
    df = load(spark, str(d), "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    got = {
        r["event_id"]: r["fmt"]
        for r in df.select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("fmt"),
        ).collect()
    }
    assert got == {
        1: "2024-01-01 00:00:01.500000",
        2: "2024-01-01 12:30:00.000250",
        3: "2024-01-30 23:59:59.999999",
    }


def test_mixed_generation_drop_dir_raises(tmp_path):
    """A drop directory mixing nanos-long and micros-timestamp files must
    fail loudly: one stream schema would silently mis-scale the other
    generation (micros read as nanos collapse to 1970) — ADVICE r2."""
    d = tmp_path / "mixed"
    d.mkdir()
    ns = _write_events(str(d), "ns")
    import shutil

    shutil.move(ns, str(d / "a_ns.parquet"))
    us = _write_events(str(d), "us")
    shutil.move(us, str(d / "b_us.parquet"))
    with pytest.raises(ValueError, match="mixed events.ts"):
        events_ts_is_nanos_long(str(d))


def test_homogeneous_multifile_dir_probes_all_files(tmp_path):
    d = tmp_path / "homo"
    d.mkdir()
    import shutil

    p = _write_events(str(d), "ns")
    shutil.copy(p, str(d / "part-1.parquet"))
    assert events_ts_is_nanos_long(str(d)) is True


def test_registry_rejects_unknown_third_generation(spark, tmp_path):
    """A hypothetical third physical shape (millis) must raise in
    registry.load instead of flowing downstream unnormalized — ADVICE r2."""
    d = tmp_path / "ms"
    d.mkdir()
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([_ROWS[0][1]], pa.timestamp("ms")),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(
        table, f"{d}/events.parquet", version="2.6", coerce_timestamps=None
    )
    # Spark reads TIMESTAMP(MILLIS) as a plain session-TZ timestamp, which
    # normalizes fine — so emulate a genuinely alien shape: string ts.
    alien = tmp_path / "alien"
    alien.mkdir()
    t2 = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(["2024-01-01"], pa.string()),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(t2, f"{alien}/events.parquet")
    from airbnb_listings_reviews_data_engineering_spark.plans.registry import (
        load as reg_load,
    )

    with pytest.raises(TypeError, match="unexpected events.ts"):
        reg_load(spark, str(alien), "events")


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_stream_read_matches_batch_load(spark, tmp_path, unit):
    d = tmp_path / unit
    d.mkdir()
    path = _write_events(str(d), unit)
    stream = read_events_stream(spark, path).select("event_id", "ts", "value")
    drained = run_available_now(
        stream, query_name=f"ts_gen_{unit}", output_mode="append"
    )
    batch = load(spark, str(d), "events").select("event_id", "ts", "value")
    assert sorted(map(tuple, drained.collect())) == sorted(
        map(tuple, batch.collect())
    )
