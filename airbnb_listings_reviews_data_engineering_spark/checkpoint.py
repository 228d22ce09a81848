"""Lineage pinning (materialize-once) with a deployment-selectable
durability mode.

Iterative operators (connected components, k-means label propagation),
self-joins over a computed signature (MinHash / SimHash / shingle sets),
and the Bloom-join reorder barrier all need to cut lineage and/or
materialize an intermediate exactly once. Three physical strategies
exist, with different durability:

- ``local`` (default): ``DataFrame.localCheckpoint`` — blocks live on
  executors. Fastest, zero external IO; NOT fault-tolerant: losing one
  executor mid-job kills the job unrecoverably (truncated lineage has no
  recompute path). Right for local/dev runs and short jobs where a retry
  is cheaper than durable IO.
- ``reliable``: ``DataFrame.checkpoint`` to the session's checkpoint
  directory (HDFS/S3/dist-FS on a cluster) — survives executor loss.
  The 1000-executor / 100 TB posture for iterative jobs whose wall-clock
  exceeds the executor MTBF.
- ``parquet``: stage the DataFrame as parquet under the configurable
  staging root (sources/staging.py) and read it back — durable AND keeps
  columnar scans + column pruning for downstream consumers; the only
  mode whose artifact can outlive the driver JVM.

Mode selection (first match wins):
  1. Spark conf ``spark.airbnb.checkpoint.mode``
  2. env ``SPARK_GRAFT_CHECKPOINT_MODE``
  3. ``local``

Every pin is tracked per-session so harnesses can free executor storage
between queries (``release_pins``) — repeated invocations in one session
otherwise accumulate checkpoint blocks (bounded per-session, but real:
182 registered queries × a few MB each adds up). Iterative loops release
the previous round's pin as soon as the next round is materialized
(``release``). A released DataFrame must not be recomputed afterwards —
its lineage was truncated; release only after the result is consumed.
"""

from __future__ import annotations

import os
import uuid
import weakref

from pyspark.sql import DataFrame, SparkSession

MODE_CONF = "spark.airbnb.checkpoint.mode"
MODE_ENV = "SPARK_GRAFT_CHECKPOINT_MODE"
RELIABLE_DIR_CONF = "spark.airbnb.checkpoint.dir"

_MODES = ("local", "reliable", "parquet")

# session JVM id -> list[(weakref to pinned DataFrame | None, release callable)]
_PINS: dict[int, list[tuple[object, object]]] = {}


def checkpoint_mode(spark: SparkSession) -> str:
    mode = spark.conf.get(MODE_CONF, None) or os.environ.get(MODE_ENV, "local")
    mode = mode.lower()
    if mode not in _MODES:
        raise ValueError(f"{MODE_CONF}={mode!r}; expected one of {_MODES}")
    return mode


def _session_key(spark: SparkSession) -> int:
    return id(spark.sparkContext)


def _track(spark: SparkSession, df: DataFrame, releaser) -> None:
    _PINS.setdefault(_session_key(spark), []).append((weakref.ref(df), releaser))


def _local_releaser(df: DataFrame):
    """Unpersist the executor blocks behind a localCheckpoint'ed (or
    reliable-checkpointed) DataFrame. The analyzed plan of the DataFrame
    returned by (local)checkpoint IS a LogicalRDD over the stored RDD;
    unpersisting that RDD frees the blocks. Wrapped defensively: if the
    internal shape ever changes, the fallback is today's behavior
    (blocks freed when the RDD is GC'd)."""
    jdf = df._jdf  # noqa: SLF001 — no public API exposes the pinned RDD

    def release() -> None:
        try:
            jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass  # best-effort: ContextCleaner frees on GC

    return release


def pin(df: DataFrame, *, eager: bool = True, label: str = "pin") -> DataFrame:
    """Materialize ``df`` once and cut its lineage, using the
    session-configured durability mode. ``eager=False`` keeps the
    materialization lazy (first action triggers it) while still
    truncating the logical plan — the Bloom-join reorder barrier; in
    ``parquet`` mode a lazy stage is impossible (the write is an action)
    so the stage happens eagerly, which preserves the barrier semantics.
    """
    spark = df.sparkSession
    mode = checkpoint_mode(spark)
    if mode == "local":
        out = df.localCheckpoint(eager=eager)
        _track(spark, out, _local_releaser(out))
        return out
    if mode == "reliable":
        sc = spark.sparkContext
        if sc._jsc.sc().checkpointDir().isEmpty():  # noqa: SLF001
            root = spark.conf.get(RELIABLE_DIR_CONF, None)
            if root is None:
                from .sources.staging import staging_root

                root = os.path.join(staging_root(spark), "_checkpoints")
            sc.setCheckpointDir(root)
        out = df.checkpoint(eager=eager)
        # blocks also land in executor storage (checkpoint persists
        # before writing); free them the same way — the durable files
        # remain the recompute path.
        _track(spark, out, _local_releaser(out))
        return out
    # parquet
    from .sources.staging import fs_delete, staging_root

    path = os.path.join(
        staging_root(spark), "_pins", f"{label}_{uuid.uuid4().hex[:12]}"
    )
    df.write.mode("overwrite").parquet(path)
    out = spark.read.parquet(path)
    # fs_delete, not rmtree: with a dist-FS staging root (hdfs://,
    # s3a://) rmtree silently never frees the staged pin (ADVICE r3)
    _track(spark, out, lambda: fs_delete(path, spark))
    return out


def release(df: DataFrame) -> None:
    """Free the storage behind one pinned DataFrame (iterative loops:
    release round N-1 once round N is materialized). No-op for frames
    that were never pinned. The frame must not be used afterwards."""
    for pins in _PINS.values():
        for i, (ref, releaser) in enumerate(pins):
            if ref() is df:
                releaser()
                pins.pop(i)
                return


def release_pins(spark: SparkSession) -> int:
    """Free every pin tracked for this session; returns how many were
    released. Harness hook: call between queries once results are
    consumed (scripts/oracle_check.py, bench.py, tests)."""
    pins = _PINS.pop(_session_key(spark), [])
    for _ref, releaser in pins:
        releaser()
    return len(pins)
