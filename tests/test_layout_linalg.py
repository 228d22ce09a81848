"""Unit tests for power iteration (vs a numpy replay of the same
rounded recursion), schema-evolution reads, and dynamic partition
overwrite (file-level: untouched partitions keep their files)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from airbnb_listings_reviews_data_engineering_spark.operators.linalg import (
    power_iteration_top_component,
)


def test_power_iteration_matches_numpy_replay(spark):
    rng = np.random.RandomState(7)
    mat = rng.randn(40, 4)
    rows = [(i, [float(v) for v in mat[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.dim: r.loading
        for r in power_iteration_top_component(
            df, "vec_id", "embedding", dims=4, iters=3
        ).collect()
    }
    # replay the EXACT recursion (same rounding points) in numpy
    v = np.array([1.0, 0.0, 0.0, 0.0])
    for _ in range(3):
        dots = np.round(mat @ v, 6)
        w = mat.T @ dots
        v = np.round(w / np.sqrt((w * w).sum()), 6)
    for d in range(4):
        assert got[d + 1] == pytest.approx(v[d], abs=2e-6)


def test_power_iteration_converges_to_dominant_direction(spark):
    # matrix with one dominant direction: all rows near [3, 1]
    rows = [(i, [3.0 + 0.01 * (i % 3), 1.0 - 0.01 * (i % 2)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.dim: r.loading
        for r in power_iteration_top_component(
            df, "vec_id", "embedding", dims=2, iters=3
        ).collect()
    }
    v = np.array([out[1], out[2]])
    expect = np.array([3.0, 1.0]) / np.linalg.norm([3.0, 1.0])
    assert abs(float(v @ expect)) > 0.9999


def test_schema_evolution_null_fills_gen1(spark, tmp_path):
    gen1 = spark.createDataFrame([(1, "a")], "id long, txt string")
    gen2 = spark.createDataFrame(
        [(2, "b", "web")], "id long, txt string, origin string"
    )
    gen1.write.parquet(str(tmp_path / "g1"))
    gen2.write.parquet(str(tmp_path / "g2"))
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(str(tmp_path))
    )
    assert set(merged.columns) == {"id", "txt", "origin"}
    rows = {r.id: r.origin for r in merged.collect()}
    assert rows == {1: None, 2: "web"}


def test_partition_overwrite_touches_only_target_partition(spark, tmp_path):
    base = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)],
        "id long, k string, v double",
    )
    df.write.partitionBy("k").parquet(base)
    b_files_before = sorted(glob.glob(os.path.join(base, "k=b", "*.parquet")))
    b_stat_before = [os.stat(f).st_mtime_ns for f in b_files_before]

    backfill = spark.createDataFrame([(1, "a", 10.0)], "id long, k string, v double")
    (
        backfill.write.partitionBy("k")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(base)
    )
    # k=b partition byte-identical (same files, same mtimes)
    b_files_after = sorted(glob.glob(os.path.join(base, "k=b", "*.parquet")))
    assert b_files_after == b_files_before
    assert [os.stat(f).st_mtime_ns for f in b_files_after] == b_stat_before
    # k=a fully replaced by the backfill (1 row), k=b untouched
    out = {(r.id, r.k): r.v for r in spark.read.parquet(base).collect()}
    assert out == {(1, "a"): 10.0, (3, "b"): 3.0}


def test_static_overwrite_would_drop_other_partitions(spark, tmp_path):
    # the failure mode dynamic mode exists to prevent: static overwrite
    # replaces the WHOLE table root
    base = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (3, "b", 3.0)], "id long, k string, v double"
    )
    df.write.partitionBy("k").parquet(base)
    backfill = spark.createDataFrame([(1, "a", 10.0)], "id long, k string, v double")
    backfill.write.partitionBy("k").mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).parquet(base)
    assert {r.k for r in spark.read.parquet(base).collect()} == {"a"}
