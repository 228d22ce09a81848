"""merge_scd2 / merge_scd2_multi edge cases the oracle fixtures don't
cover: brand-new keys insert as current rows, a same-value update is a
no-op, and a batch carrying a key's full ordered history folds into
stacked validity segments."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_reviews_data_engineering_spark.operators.merge import (
    merge_scd2,
    merge_scd2_multi,
)

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


def test_scd2_multi_folds_full_history_one_batch(spark):
    # ONE batch carries key 1's full ordered history: a leading no-op
    # (same value as the base current row), then three real changes with
    # a duplicate in the middle. Expect the current row closed at the
    # first REAL change and three stacked segments.
    updates = spark.createDataFrame(
        [
            (1, "a", "2024-02-01"),    # no-op vs base current -> dropped
            (1, "x", "2024-03-01"),
            (1, "x", "2024-05-01"),    # duplicate of predecessor -> dropped
            (1, "y", "2024-07-01"),
            (1, "z", "2024-09-01"),
        ],
        "k long, attr string, eff string",
    )
    out = merge_scd2_multi(_base(spark), updates, ["k"], ["attr"], "eff")
    k1 = {(r.attr, r.valid_from): r for r in out.filter(F.col("k") == 1).collect()}
    assert len(k1) == 4  # closed base row + x + y + z
    assert k1[("a", "2024-01-01")].valid_to == "2024-03-01"
    assert not k1[("a", "2024-01-01")].is_current
    assert k1[("x", "2024-03-01")].valid_to == "2024-07-01"
    assert k1[("y", "2024-07-01")].valid_to == "2024-09-01"
    assert k1[("z", "2024-09-01")].valid_to is None
    assert k1[("z", "2024-09-01")].is_current
    cur = out.filter(F.col("is_current") & (F.col("k") == 1)).collect()
    assert len(cur) == 1  # exactly one current row survives the fold


def test_scd2_multi_noop_only_and_new_key_stack(spark):
    updates = spark.createDataFrame(
        [
            (2, "b", "2024-06-01"),    # only a no-op change -> untouched
            (9, "n1", "2024-02-01"),   # unseen key, 2-segment stack
            (9, "n2", "2024-08-01"),
        ],
        "k long, attr string, eff string",
    )
    out = merge_scd2_multi(_base(spark), updates, ["k"], ["attr"], "eff")
    k2 = out.filter(F.col("k") == 2).collect()
    assert {(r.attr, r.is_current) for r in k2} == {("b", True), ("old", False)}
    assert out.filter(F.col("is_current") & (F.col("k") == 2)).first().valid_from == "2024-01-01"
    k9 = {r.attr: r for r in out.filter(F.col("k") == 9).collect()}
    assert k9["n1"].valid_to == "2024-08-01" and not k9["n1"].is_current
    assert k9["n2"].valid_to is None and k9["n2"].is_current


def test_scd2_multi_matches_scd2_on_single_change_batch(spark):
    # on a latest-only batch the two operators must agree exactly
    updates = spark.createDataFrame(
        [(1, "a2", "2024-06-01"), (3, "c", "2024-06-01")],
        "k long, attr string, eff string",
    )
    single = merge_scd2(_base(spark), updates, ["k"], ["attr"], "eff")
    multi = merge_scd2_multi(_base(spark), updates, ["k"], ["attr"], "eff")
    assert sorted(map(str, single.collect())) == sorted(map(str, multi.collect()))


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
