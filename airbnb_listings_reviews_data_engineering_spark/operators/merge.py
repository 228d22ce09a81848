"""Upsert / merge operators.

The reference upserts row-at-a-time into Postgres
(``insert_rows(upsert=True, replace=True, replace_index='id')``,
Airbnb_Listings_ETL.py:143-151) and into Mongo (``replace_one(...,
upsert=True)``, Airbnb_Listings_ETL.py:201-207; ``update_one({'$addToSet':
...})``, Airbnb_Review_ETL.py:100-111). Spark has no per-row upsert — the
equivalents are set-oriented merges that shuffle once on the key:

- ``upsert_snapshot``: updates win, unmatched base rows survive — the
  semantics of replace-style upsert. One left-anti join + union; with AQE
  the anti join broadcasts when the batch is small.
- ``merge_full_outer``: column-wise COALESCE merge (MERGE INTO ... WHEN
  MATCHED UPDATE WHEN NOT MATCHED INSERT, emulated without Delta — the
  Delta jar is not on this classpath; swap to ``MERGE INTO`` when it is).
- ``merge_array_accum``: $addToSet nested-array accumulation — full-outer
  join + array_distinct(concat(...)), sorted for determinism.

All three are idempotent: re-applying the same batch is a no-op, which is
what makes the reference's daily re-run + task-retry model safe at scale
(SURVEY.md §2.8).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def any_column_changed(
    cols: Sequence[str], left_alias: str, right_alias: str
) -> F.Column:
    """Null-safe "any of these columns differs" OR-fold between two
    aliased sides — the change-detection predicate shared by merge_scd2
    and sources/atomic.diff_versions (one definition, so a semantics fix
    reaches both)."""
    pred = F.lit(False)
    for c in cols:
        pred = pred | ~F.col(f"{left_alias}.{c}").eqNullSafe(
            F.col(f"{right_alias}.{c}")
        )
    return pred


def upsert_snapshot(base: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Replace-style upsert: rows from ``updates`` win on key collision,
    unmatched ``base`` rows are kept. Schemas must match by name."""
    keys = list(keys)
    survivors = base.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
    return updates.unionByName(survivors.select(*updates.columns))


def merge_full_outer(
    base: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Column-wise merge: for non-key columns take the update value when a
    matching key exists, else the base value (MERGE INTO emulation)."""
    keys = list(keys)
    b = base.alias("b")
    u = updates.alias("u")
    joined = b.join(u, on=keys, how="full_outer")
    cols = [F.col(k).alias(k) for k in keys]
    for c in base.columns:
        if c in keys:
            continue
        cols.append(F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c))
    return joined.select(*cols)


def merge_scd2(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    effective: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge.

    ``base`` is the history table (columns = keys + tracked +
    valid_from/valid_to/is_current); ``updates`` carries keys + tracked +
    an ``effective`` date column. A key whose tracked attributes changed
    gets its current row CLOSED (valid_to = effective, is_current =
    false) and a new current row appended; unchanged keys and already-
    closed history pass through untouched; unseen keys insert. One
    shuffle join on the key — the set-oriented form of the per-row
    UPDATE+INSERT a row-store runs, and what MERGE INTO + a history
    table does on Delta/Iceberg.

    A batch carrying several rows for one key would match the current
    row several times and emit several `is_current` rows — so updates
    are first deduplicated to the LATEST effective date per key (ties
    broken by tracked values for determinism), matching what MERGE INTO
    requires of its source. Multi-step history in one batch needs an
    ordered per-key fold, which is a different operator.
    """
    keys = list(keys)
    tracked = list(tracked)
    if not tracked:
        raise ValueError("merge_scd2 needs at least one tracked column")
    from pyspark.sql import Window as W

    latest = F.row_number().over(
        W.partitionBy(*keys).orderBy(
            F.col(effective).desc(), *[F.col(t).asc_nulls_last() for t in tracked]
        )
    )
    updates = (
        updates.withColumn("_rk", latest).filter(F.col("_rk") == 1).drop("_rk")
    )
    changed_pred = any_column_changed(tracked, "b", "u")

    current = base.filter(F.col("is_current")).alias("b")
    history = base.filter(~F.col("is_current"))
    u = updates.alias("u")

    joined = current.join(u, on=[F.col(f"b.{k}") == F.col(f"u.{k}") for k in keys], how="left")
    unchanged = joined.filter(F.col(f"u.{keys[0]}").isNull() | ~changed_pred).select("b.*")
    closed = (
        joined.filter(F.col(f"u.{keys[0]}").isNotNull() & changed_pred)
        .select(
            *[F.col(f"b.{c}").alias(c) for c in base.columns if c != "valid_to" and c != "is_current"],
            F.col(f"u.{effective}").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
        .select(*base.columns)
    )
    fresh_src = u.join(
        current, on=[F.col(f"u.{k}") == F.col(f"b.{k}") for k in keys], how="left"
    )
    fresh = (
        fresh_src.filter(F.col(f"b.{keys[0]}").isNull() | changed_pred)
        .select(
            *[F.col(f"u.{k}").alias(k) for k in keys],
            *[F.col(f"u.{t}").alias(t) for t in tracked],
            F.col(f"u.{effective}").alias("valid_from"),
            F.lit(None).cast(dict(base.dtypes)["valid_to"]).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .select(*base.columns)
    )
    return history.unionByName(unchanged).unionByName(closed).unionByName(fresh)


def merge_scd2_multi(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    effective: str,
) -> DataFrame:
    """SCD2 merge folding a key's FULL ordered change history per batch.

    `merge_scd2` collapses each batch to the latest change per key — the
    MERGE INTO contract, but a CDC backfill replay delivers a key's whole
    intra-batch history at once and every intermediate state must become
    a validity segment. This operator is that ordered per-key fold:

    - changes sort within key by (effective, tracked) — deterministic at
      any parallelism;
    - no-op transitions compress out: a change equal to its PREDECESSOR
      state (the prior change in the batch, or the base current row for
      the first change) is dropped. Equality chains compress transitively
      because a dropped change's value equals its predecessor's by
      definition, so the lag comparison sees through it;
    - survivors become stacked segments: valid_from = effective,
      valid_to = lead(effective) within the key, last segment open +
      is_current;
    - the base current row closes at the FIRST surviving change's
      effective; keys whose changes all compressed away pass through
      untouched, as do unseen keys' full segment stacks (insert path).

    Two key-partitioned window passes + one join against current — no
    global window, no per-row loop; the shape MERGE INTO cannot express
    and warehouses hand-roll for backfills.
    """
    keys = list(keys)
    tracked = list(tracked)
    if not tracked:
        raise ValueError("merge_scd2_multi needs at least one tracked column")
    from pyspark.sql import Window as W

    current = base.filter(F.col("is_current"))
    history = base.filter(~F.col("is_current"))
    vt_type = dict(base.dtypes)["valid_to"]

    b = current.select(
        *keys,
        *[F.col(t).alias(f"_base_{t}") for t in tracked],
        F.lit(True).alias("_has_base"),
    )
    order = [F.col(effective).asc()] + [
        F.col(t).asc_nulls_last() for t in tracked
    ]
    w = W.partitionBy(*keys).orderBy(*order)
    u = updates.join(b, on=keys, how="left").withColumn(
        "_seq", F.row_number().over(w)
    )
    for t in tracked:
        u = u.withColumn(f"_prev_{t}", F.lag(t).over(w))

    prev_differs = F.lit(False)
    base_differs = F.lit(False)
    for t in tracked:
        prev_differs = prev_differs | ~F.col(f"_prev_{t}").eqNullSafe(F.col(t))
        base_differs = base_differs | ~F.col(f"_base_{t}").eqNullSafe(F.col(t))
    survive = F.when(
        F.col("_seq") == 1, F.col("_has_base").isNull() | base_differs
    ).otherwise(prev_differs)
    surv = u.filter(survive)

    segs = (
        surv.select(
            *keys,
            *tracked,
            F.col(effective).alias("valid_from"),
            F.lead(effective).over(w).cast(vt_type).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*base.columns)
    )
    firsts = surv.groupBy(*keys).agg(F.min(effective).alias("_first_eff"))
    closed = (
        current.alias("b")
        .join(firsts, on=keys, how="inner")
        .select(
            *[
                F.col(f"b.{c}").alias(c)
                for c in base.columns
                if c not in ("valid_to", "is_current")
            ],
            F.col("_first_eff").cast(vt_type).alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
        .select(*base.columns)
    )
    unchanged = current.join(firsts.select(*keys), on=keys, how="left_anti")
    return (
        history.unionByName(unchanged).unionByName(closed).unionByName(segs)
    )


def merge_array_accum(
    base: DataFrame,
    batch: DataFrame,
    key: str,
    array_col: str,
) -> DataFrame:
    """$addToSet accumulation: union the per-key arrays with set semantics.

    Both inputs carry ``key`` and an array column ``array_col``; output is
    one row per key with the sorted distinct union of both arrays. Sorting
    makes the result deterministic at any parallelism (Mongo's $addToSet
    preserves arrival order, which is not reproducible distributed).
    """
    empty = F.array().cast(dict(base.dtypes)[array_col])
    joined = base.withColumnRenamed(array_col, "_old").join(
        batch.withColumnRenamed(array_col, "_new"), on=key, how="full_outer"
    )
    merged = F.array_sort(
        F.array_distinct(
            F.concat(
                F.coalesce(F.col("_old"), empty), F.coalesce(F.col("_new"), empty)
            )
        )
    )
    return joined.select(F.col(key), merged.alias(array_col))
