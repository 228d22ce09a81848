"""merge_scd2 edge cases the oracle fixture doesn't cover: brand-new
keys insert as current rows, and a same-value update is a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_reviews_data_engineering_spark.operators.merge import merge_scd2

BASE_SCHEMA = (
    "k long, attr string, valid_from string, valid_to string, is_current boolean"
)


def _base(spark):
    return spark.createDataFrame(
        [
            (1, "a", "2024-01-01", None, True),
            (2, "b", "2024-01-01", None, True),
            (2, "old", "2023-01-01", "2024-01-01", False),  # closed history
        ],
        BASE_SCHEMA,
    )


def test_scd2_change_noop_and_insert(spark):
    updates = spark.createDataFrame(
        [
            (1, "a2", "2024-06-01"),  # changed -> close + new version
            (2, "b", "2024-06-01"),   # same value -> no-op
            (3, "c", "2024-06-01"),   # unseen key -> insert
        ],
        "k long, attr string, eff string",
    )
    out = merge_scd2(_base(spark), updates, ["k"], ["attr"], "eff")
    rows = {(r.k, r.attr): r for r in out.collect()}
    assert len(rows) == 5
    # key 1: old version closed at effective date, new version current
    assert rows[(1, "a")].valid_to == "2024-06-01" and not rows[(1, "a")].is_current
    assert rows[(1, "a2")].valid_from == "2024-06-01" and rows[(1, "a2")].is_current
    assert rows[(1, "a2")].valid_to is None
    # key 2: same-value update leaves current row untouched; history kept
    assert rows[(2, "b")].is_current and rows[(2, "b")].valid_from == "2024-01-01"
    assert not rows[(2, "old")].is_current
    # key 3: fresh insert, current from the effective date
    assert rows[(3, "c")].is_current and rows[(3, "c")].valid_from == "2024-06-01"


def test_scd2_idempotent_reapply(spark):
    updates = spark.createDataFrame(
        [(1, "a2", "2024-06-01"), (3, "c", "2024-06-01")],
        "k long, attr string, eff string",
    )
    once = merge_scd2(_base(spark), updates, ["k"], ["attr"], "eff")
    twice = merge_scd2(once, updates, ["k"], ["attr"], "eff")
    assert sorted(map(str, once.collect())) == sorted(map(str, twice.collect()))


def test_scd2_multi_row_batch_keeps_latest_per_key(spark):
    updates = spark.createDataFrame(
        [(1, "mid", "2024-03-01"), (1, "late", "2024-06-01")],
        "k long, attr string, eff string",
    )
    out = merge_scd2(_base(spark), updates, ["k"], ["attr"], "eff")
    cur = out.filter(F.col("is_current") & (F.col("k") == 1)).collect()
    assert len(cur) == 1  # exactly ONE current row per key, always
    assert cur[0].attr == "late" and cur[0].valid_from == "2024-06-01"


def test_scd2_requires_tracked_columns(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="tracked"):
        merge_scd2(_base(spark), _base(spark), ["k"], [], "eff")


def test_scd2_null_safe_change_detection(spark):
    base = spark.createDataFrame(
        [(1, None, "2024-01-01", None, True)], BASE_SCHEMA
    )
    updates = spark.createDataFrame(
        [(1, None, "2024-06-01")], "k long, attr string, eff string"
    )
    out = merge_scd2(base, updates, ["k"], ["attr"], "eff")
    # NULL == NULL must be a no-op, not a spurious new version
    assert out.count() == 1
    assert out.filter(F.col("is_current")).first().valid_from == "2024-01-01"
