"""Scale-guarded percentile: exact when safe, GK sketch when not.

Spark's exact ``percentile`` is an ObjectHashAggregate that buffers
EVERY group value in its aggregation buffer. Grouped by a low-cardinality
key at 100× scale that is hundreds of millions of doubles in a handful of
buffers — an executor OOM, not a slowdown. ``approx_percentile`` (the
Greenwald-Khanna sketch) bounds state at ~O(accuracy) per group and
merges map-side, but trades exactness for a rank error <= n/accuracy.

``guarded_percentile`` makes the switch automatic: a cheap probe asks
"does ANY group hold more than ``maxExactGroupRows`` values?" and picks
the exact aggregate only when the answer is no. The probe is itself
100 TB-safe — a plain count aggregation (map-side partial combine)
followed by ``filter(n > threshold).limit(1).count()``, i.e. an
existence check that short-circuits; no value buffering, no collect.
The chosen aggregate is visible in the physical plan (``percentile`` vs
``approx_percentile`` in the Aggregate node), which is what
tests/test_plan_quality.py pins.

Threshold conf: ``spark.airbnb.percentile.maxExactGroupRows`` (default
10,000,000 — roughly the point where one group's buffered doubles start
to crowd a 4 GiB executor heap share; see plans/approx_ext.py for the
documented crossover rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GUARD_CONF = "spark.airbnb.percentile.maxExactGroupRows"
DEFAULT_MAX_EXACT_GROUP_ROWS = 10_000_000

# (cache_key, threshold) -> probe verdict. Sound only for immutable
# inputs (the registered queries read fixed per-sf_dir parquet); callers
# with mutable inputs simply omit cache_key and re-probe each time.
_PROBE_CACHE: dict[tuple, bool] = {}


def exact_fits(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    threshold: int | None = None,
    cache_key: tuple | None = None,
) -> bool:
    """True iff every group's value count is within the exact-percentile
    buffer budget. One aggregation + existence probe; never buffers
    values and never collects a result set. ``cache_key`` memoizes the
    verdict for immutable inputs (table statistics, in effect) so
    repeated plan builds don't re-pay the probe scan."""
    spark = df.sparkSession
    if threshold is None:
        threshold = int(
            spark.conf.get(GUARD_CONF, str(DEFAULT_MAX_EXACT_GROUP_ROWS))
        )
    memo = (cache_key, threshold) if cache_key is not None else None
    if memo is not None and memo in _PROBE_CACHE:
        return _PROBE_CACHE[memo]
    oversized = (
        df.groupBy(*group_cols)
        .agg(F.count(value_col).alias("n"))
        .filter(F.col("n") > threshold)
        .limit(1)
        .count()
    )
    fits = oversized == 0
    if memo is not None:
        _PROBE_CACHE[memo] = fits
    return fits


def percentile_expr(p: float, value_col: str, exact: bool, accuracy: int = 10000) -> Column:
    """The percentile aggregate for one quantile, exact or sketched."""
    if exact:
        return F.expr(f"percentile({value_col}, {p!r})")
    return F.percentile_approx(value_col, p, accuracy)


def guarded_percentile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: dict[str, float],
    threshold: int | None = None,
    accuracy: int = 10000,
    decimals: int = 4,
    exact: bool | None = None,
    cache_key: tuple | None = None,
) -> tuple[DataFrame, bool]:
    """Grouped percentile(s) with the exact/approx choice made from the
    data. ``quantiles`` maps output alias -> quantile. Returns
    (aggregated DataFrame, chose_exact). Pass ``exact`` to reuse an
    already-computed probe verdict (one probe can guard several
    aggregations over the same grouping)."""
    if exact is None:
        exact = exact_fits(df, group_cols, value_col, threshold, cache_key)
    aggs = [
        F.round(percentile_expr(p, value_col, exact, accuracy), decimals).alias(a)
        for a, p in quantiles.items()
    ]
    return df.groupBy(*group_cols).agg(*aggs), exact
