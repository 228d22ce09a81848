"""Distributed linear algebra on embedding columns: power iteration.

Top principal direction of the (uncentered) Gram matrix X'X — the
leading right singular vector of the embedding matrix — via power
iteration, the decomposition that scales to 100 TB of vectors:

  dot    — per-row x·v against the broadcast current direction
           (map-side, whole-stage codegen, no shuffle);
  matvec — w = Σ_rows (x·v)·x accumulated per dimension: posexplode +
           groupBy(pos) with map-side partial sums, so the ONLY shuffle
           per round moves dims × n_partitions partial rows, never the
           corpus;
  renorm — 1-row norm aggregate broadcast back into the next direction.

Between rounds the whole state is one dims-length vector (a pinned
1-row frame). The corpus is re-scanned per round but never shuffled.

Determinism contract (oracle parity): per-row dots accumulate
sequentially (zip_with + aggregate, matching DuckDB's in-list-order
list_sum) and round to 6 dp; the renormalized direction rounds each
coordinate to 6 dp per round. v0 = e1 (fixed), so the sign of the
result is pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import pin
from ..functions.arrays import as_double_array


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, e: acc + e
    )


def power_iteration_direction(
    df: DataFrame, id_col: str, vec_col: str, dims: int = 8, iters: int = 3
) -> DataFrame:
    """The trainable half: the ONE-row frame holding the final direction
    array ``v`` — broadcastable into any downstream per-row projection
    (see plans' emb_pca_project)."""
    x = df.select(F.slice(as_double_array(vec_col), 1, dims).alias("xv"))
    spark = df.sparkSession
    v = spark.range(1).select(
        F.array(F.lit(1.0), *[F.lit(0.0) for _ in range(dims - 1)]).alias("v")
    )
    for _ in range(iters):
        dots = x.crossJoin(F.broadcast(v)).select(
            "xv", F.round(_dot(F.col("xv"), F.col("v")), 6).alias("dot")
        )
        w = (
            dots.select("dot", F.posexplode("xv").alias("pos", "val"))
            .groupBy("pos")
            .agg(F.sum(F.col("dot") * F.col("val")).alias("w"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        wn = w.crossJoin(F.broadcast(nrm)).select(
            "pos", F.round(F.col("w") / F.col("nrm"), 6).alias("vv")
        )
        # dims rows -> one array row; single-group agg over a tiny frame
        v = pin(
            wn.groupBy().agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "vv"))),
                    lambda s: s["vv"],
                ).alias("v")
            ),
            label="power_iter_v",
        )
    return v


def power_iteration_top_component(
    df: DataFrame, id_col: str, vec_col: str, dims: int = 8, iters: int = 3
) -> DataFrame:
    """Leading right singular direction of the row vectors in ``vec_col``
    (first ``dims`` coordinates), after ``iters`` power-iteration rounds
    from v0 = e1. Returns (dim, loading) with dim 1-based."""
    v = power_iteration_direction(df, id_col, vec_col, dims, iters)
    return v.select(F.posexplode("v").alias("pos", "loading")).select(
        (F.col("pos") + 1).alias("dim"), "loading"
    )
