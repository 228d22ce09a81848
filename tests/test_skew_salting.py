"""Skewed-fixture proof for the salted join (VERDICT r1 "Next round" #5).

The driver testdata's keys are uniform, so join_salted demonstrates the
technique but never NEEDS it. This fixture makes one key own 30 % of the
rows and measures the thing salting exists to fix: the row-count spread
across shuffle partitions (the deterministic proxy for task wall-time —
a shuffle partition's work is linear in its rows). Unsalted, the hot
key's partition holds >=30 % of all rows no matter how many partitions
you add; salted by 8, the hot key splits into 8 cells and the max
partition is bounded near the mean. Correctness is asserted separately:
salted and unsalted joins return identical aggregates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_ROWS = 100_000
N_KEYS = 50
HOT_KEY = 0
HOT_FRAC = 0.30
SALT_N = 8
SHUFFLE_PARTS = 32


@pytest.fixture(scope="module")
def skewed(spark):
    """~30 % of rows on HOT_KEY, the rest uniform over the other keys."""
    n_hot = int(N_ROWS * HOT_FRAC)
    df = spark.range(N_ROWS).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < n_hot, F.lit(HOT_KEY))
        .otherwise(1 + F.pmod(F.col("id"), F.lit(N_KEYS - 1)))
        .cast("long")
        .alias("key"),
        (F.col("id") % 997).cast("double").alias("val"),
        # incompressible payload: without it, column pruning + lz4 shrink
        # the hot key's shuffle partition below any byte threshold and
        # AQE (rightly) sees no skew — real rows have real payloads
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(N_KEYS).select(
        F.col("id").alias("key"), F.concat(F.lit("k"), F.col("id")).alias("name")
    )


def _partition_sizes(df, *cols):
    """Row count per shuffle partition under hash partitioning on cols —
    exactly the distribution a shuffle join on those keys produces."""
    return [
        r.n
        for r in df.repartition(SHUFFLE_PARTS, *[F.col(c) for c in cols])
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]


def test_unsalted_hot_key_dominates_one_partition(skewed):
    sizes = _partition_sizes(skewed, "key")
    # the hot key is unsplittable: one partition carries >= its 30 %
    assert max(sizes) >= N_ROWS * HOT_FRAC
    assert max(sizes) > 5 * (sum(sizes) / len(sizes))


def test_salted_partitions_are_bounded(skewed):
    salted = skewed.withColumn(
        "salt", F.pmod(F.col("row_id"), F.lit(SALT_N)).cast("int")
    )
    sizes = _partition_sizes(salted, "key", "salt")
    mean = sum(sizes) / len(sizes)
    # hot key now contributes HOT_FRAC/SALT_N (~3.75 %) per cell; no
    # partition may exceed 3x the mean (vs >9x unsalted)
    assert max(sizes) <= 3 * mean, sizes
    assert max(sizes) < N_ROWS * HOT_FRAC / 2


def test_salted_join_equals_unsalted_join(skewed, dim):
    plain = (
        skewed.join(dim, "key")
        .groupBy("name")
        .agg(F.count("*").alias("n"), F.round(F.sum("val"), 4).alias("s"))
    )
    salted_fact = skewed.withColumn(
        "salt", F.pmod(F.col("row_id"), F.lit(SALT_N)).cast("int")
    )
    replicated_dim = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_N - 1)))
    ).withColumn("salt", F.col("salt").cast("int"))
    salted = (
        salted_fact.hint("merge")
        .join(replicated_dim, ["key", "salt"])
        .groupBy("name")
        .agg(F.count("*").alias("n"), F.round(F.sum("val"), 4).alias("s"))
    )
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))


def test_aqe_skew_join_also_splits_it(spark, skewed, dim):
    """AQE's skewedJoin is the first-choice fix; the manual salt is the
    fallback when it can't apply. Prove AQE detects THIS fixture."""
    conf = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        # the downstream agg re-shuffles anyway; don't let that veto the split
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        # aggregate the payload so pruning keeps it in the shuffle
        joined = (
            skewed.join(dim, "key")
            .groupBy("name")
            .agg(F.count("*").alias("n"), F.min("payload").alias("p0"))
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isSkew=true" in plan or "skew=true" in plan, plan[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
