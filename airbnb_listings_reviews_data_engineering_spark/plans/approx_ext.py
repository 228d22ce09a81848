"""Approximate-aggregate battery — the documented 100 TB escape hatches
as checked code (VERDICT r1 "Next round" #1a/#6).

``agg_percentile`` (plans/relational.py) is exact because the oracle
hash-match requires it, but Spark's exact ``percentile`` is an
ObjectHashAggregate that buffers EVERY group value in memory — grouped by
a 3-value key, 100× scale means hundreds of millions of doubles in 3
aggregation buffers: an OOM, not a slowdown. The scale path is
``approx_percentile`` (GK sketch: bounded memory ~O(accuracy), mergeable
map-side). Likewise exact ``count(DISTINCT x)`` expands to a two-phase
shuffle on (group, x); ``approx_count_distinct`` (HyperLogLog++) is one
pass with a fixed-size register set per group.

A sketch's raw output is not bitwise-stable across engines (Spark GK vs
DuckDB's t-digest), so these keys hash-match on the sketch's ERROR
GUARANTEE instead: each query computes the approximate answer AND a
scale-safe exact check of the bound, emitting a boolean that must be
TRUE per group. The oracle states the same invariant (`TRUE AS ok`), so
a sketch whose error exceeds its contract fails the gate. The rank check
is itself 100 TB-safe: it is a second plain aggregation (sum of a
comparison), never a buffered exact percentile.

Switch guidance (docstring contract promised at relational.py
agg_percentile): stay exact while the largest group's value count fits
an executor's aggregation buffer (~tens of millions of doubles);
beyond that, approx_percentile(accuracy=10000) bounds rank error at
n/10000 with ~KB-scale state per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load, register

# ---------------------------------------------------------------------------
# approx percentile with a rank-error-bound oracle
# ---------------------------------------------------------------------------

_APPROX_PCTL_SQL = """
SELECT l_returnflag, TRUE AS ok
FROM lineitem GROUP BY l_returnflag
"""


@register("agg_percentile_approx", oracle=_APPROX_PCTL_SQL)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile median with its rank guarantee checked exactly.

    Pass 1: GK-sketch median per l_returnflag (accuracy 10000 -> rank
    error <= n/10000, fixed memory). Pass 2: broadcast the 3-row medians
    back onto lineitem and compute frac_le = fraction of group values <=
    the approximate median — a plain sum/count aggregation, no value
    buffering. The GK contract plus value-tie slack means frac_le must
    land in [0.48, 0.52]; `ok` asserts it. The broadcast side has FIXED
    cardinality (3 return flags), so the hint is scale-safe, unlike a
    dimension that grows with SF.
    """
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    apx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("apx")
    )
    frac = (
        li.join(F.broadcast(apx), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            (
                F.sum(F.when(F.col("l_extendedprice") <= F.col("apx"), 1).otherwise(0))
                / F.count("*")
            ).alias("frac_le")
        )
    )
    return frac.select(
        "l_returnflag",
        ((F.col("frac_le") >= 0.48) & (F.col("frac_le") <= 0.52)).alias("ok"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog approx count distinct with a relative-error oracle
# ---------------------------------------------------------------------------

_APPROX_NDV_SQL = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact, TRUE AS ok
FROM orders GROUP BY o_orderpriority
"""


@register("agg_approx_count_distinct", oracle=_APPROX_NDV_SQL)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ NDV per group, checked against exact within 3 sigma.

    approx_count_distinct(rsd=0.02) keeps ~1.5 KB of registers per group
    and merges map-side — one narrow shuffle regardless of cardinality.
    The exact count here is the verifier (and is itself shuffle-safe: a
    two-phase (group, value) distinct, no buffering); `ok` asserts the
    HLL estimate is within 6 % (3 x rsd) of exact, which holds with
    probability ~0.997 per group — deterministic in practice because the
    HLL hash is fixed, so the same data always yields the same estimate.
    """
    o = load(spark, sf_dir, "orders").select("o_orderpriority", "o_custkey")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_apx"),
            F.countDistinct("o_custkey").alias("n_exact"),
        )
        .select(
            "o_orderpriority",
            "n_exact",
            (
                F.abs(F.col("n_apx") - F.col("n_exact"))
                / F.col("n_exact").cast("double")
                <= F.lit(0.06)
            ).alias("ok"),
        )
    )


# ---------------------------------------------------------------------------
# mergeable HLL sketches: per-partition build, cross-partition union
# ---------------------------------------------------------------------------

_HLL_ROLLUP_SQL = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact, TRUE AS ok
FROM orders GROUP BY o_orderpriority
"""


@register("agg_hll_sketch_rollup", oracle=_HLL_ROLLUP_SQL)
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: DataSketches HLL built per (priority,
    month), then UNION-merged across months per priority — the pattern
    that makes 100 TB NDV rollups cheap: fine-grained sketches are
    materialized once at ingest partition granularity (KBs each), and
    ANY coarser slice is answered by merging sketches instead of
    re-scanning raw data. `hll_union_agg` is exactly the re-aggregation
    `approx_count_distinct` cannot do (its estimate is final; sketches
    compose). The estimate is checked against the exact NDV within 6 %
    (the lgConfigK=12 default gives ~1.6 % rsd; deterministic because
    the sketch hash is fixed), and the oracle asserts the same contract.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
        "o_custkey",
    )
    sketches = o.groupBy("o_orderpriority", "mon").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    est = sketches.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_apx")
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    return est.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "n_exact",
        (
            F.abs(F.col("n_apx") - F.col("n_exact")) / F.col("n_exact").cast("double")
            <= F.lit(0.06)
        ).alias("ok"),
    )
