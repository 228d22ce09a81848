"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (exact, one map-side pass + a top-k
reduce — Spark's takeOrdered-style sort-limit is a per-partition heap
followed by a driver merge of k*partitions rows, NOT a full sort).

Scale path: LSH bucketing with data-derived hyperplanes — the bucket id
is a per-row column expression, so index build is shuffle-free; a query
probes one bucket (an equi-join), turning the 100 TB scan into a
1/2^planes slice. IVF (k-means cells) would follow the same plan shape
with learned centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import as_double_array, cosine, dot


def brute_force_topk(
    df: DataFrame, id_col: str, vec_col: str, query: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine to the (single-row) query vector.

    The query side is broadcast; scores round to 6 dp for cross-engine
    determinism; ties break on id.
    """
    q = F.broadcast(query.select(as_double_array(vec_col).alias("qv")))
    scored = (
        df.select(F.col(id_col), as_double_array(vec_col).alias("v"))
        .crossJoin(q)
        .select(
            F.col(id_col),
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def brute_force_topk_pandas(
    df: DataFrame, id_col: str, vec_col: str, query: DataFrame, k: int = 10
) -> DataFrame:
    """Same exact top-k as :func:`brute_force_topk`, scored by an
    Arrow-vectorized Pandas UDF (numpy matmul per batch) instead of the
    JVM higher-order functions — the faster path for very wide vectors,
    and the template for any scoring the built-ins can't express."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    qv = np.asarray(query.select(vec_col).first()[0], dtype=np.float64)
    qn = float(np.sqrt(qv @ qv))

    def _cos(v):
        m = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        dots = m @ qv
        norms = np.sqrt((m * m).sum(axis=1)) * qn
        return pd.Series(np.round(dots / norms, 6))

    # NB: lambda-style registration — `from __future__ import annotations`
    # stringifies type hints, which pandas_udf cannot resolve for locally
    # imported pandas.
    cos = pandas_udf(_cos, "double")

    scored = df.select(
        F.col(id_col), cos(as_double_array(vec_col)).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def with_lsh_bucket(
    df: DataFrame, id_col: str, vec_col: str, planes: DataFrame, plane_id: str, n_planes: int
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector.

    ``planes`` is a tiny (n_planes-row) DataFrame of hyperplane vectors —
    broadcast; bucket bit j = sign(dot(v, plane_j)). One cross join against
    n_planes rows + a groupBy on the id: both scale linearly.
    """
    v = df.select(F.col(id_col), as_double_array(vec_col).alias("v"))
    p = F.broadcast(
        planes.select(F.col(plane_id).alias("pid"), as_double_array(vec_col).alias("pv"))
    )
    bits = v.crossJoin(p).select(
        F.col(id_col),
        F.when(
            dot(F.col("v"), F.col("pv")) > 0,
            F.expr("shiftleft(1, cast(pid - 1 as int))"),
        )
        .otherwise(0)
        .alias("bit"),
    )
    buckets = bits.groupBy(id_col).agg(F.sum("bit").cast("bigint").alias("bucket"))
    return df.join(buckets, id_col)


def lsh_probe(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: DataFrame,
    plane_id: str,
    n_planes: int,
    query_id: int,
) -> DataFrame:
    """ANN probe: score only the vectors in the query's LSH bucket."""
    bucketed = with_lsh_bucket(
        df, id_col, vec_col, planes, plane_id, n_planes
    ).localCheckpoint(eager=True)
    qrow = bucketed.filter(F.col(id_col) == query_id).select(
        F.col("bucket").alias("qbucket"), as_double_array(vec_col).alias("qv")
    )
    return (
        bucketed.join(F.broadcast(qrow), F.col("bucket") == F.col("qbucket"))
        .select(
            F.col(id_col),
            F.round(cosine(as_double_array(vec_col), F.col("qv")), 6).alias("cos_sim"),
        )
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_salt: int = 32,
) -> DataFrame:
    """Batch k-NN join: exact cosine top-k neighbors for EVERY query row.

    The query side must be small (it is broadcast); `queries` needs
    columns (q_id, qv). Scoring is one broadcast-nested-loop pass over
    the corpus — linear, no shuffle. The top-k-per-query step is the
    scale hazard: a plain window over q_id would shuffle the ENTIRE
    scored corpus onto |queries| partitions (5 queries -> 5 hot tasks
    holding N/5 rows each). Instead, two-stage salted top-k:

      stage 1: row_number over (q_id, salt) — n_salt * |queries| uniform
               keys, each task ranks ~N/(|q|*n_salt) rows, keeps k;
      stage 2: row_number over q_id on the <= k*n_salt survivors — a
               trivially small exchange.

    Same result as the single-window formulation (top-k of a union of
    per-salt top-ks is the global top-k since every candidate's global
    rank <= its salt-local rank); ties break on id so ranks are
    deterministic. This is the distributed-top-k-per-group pattern that
    survives 100x corpus growth with fixed per-task memory.
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    scored = (
        corpus.select(F.col(id_col), as_double_array(vec_col).alias("v"))
        .crossJoin(F.broadcast(queries))
        .select(
            "q_id",
            F.col(id_col),
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
            (F.crc32(F.col(id_col).cast("string")) % n_salt).alias("salt"),
        )
    )
    w_local = Window.partitionBy("q_id", "salt").orderBy(F.desc("cos_sim"), id_col)
    w_global = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), id_col)
    return (
        scored.withColumn("r", F.row_number().over(w_local))
        .filter(F.col("r") <= k)
        .drop("r", "salt")
        .withColumn("rnk", F.row_number().over(w_global))
        .filter(F.col("rnk") <= k)
        .select("q_id", F.col(id_col), "cos_sim", F.col("rnk").cast("int").alias("rnk"))
    )
