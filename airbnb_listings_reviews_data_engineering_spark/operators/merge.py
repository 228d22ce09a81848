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
