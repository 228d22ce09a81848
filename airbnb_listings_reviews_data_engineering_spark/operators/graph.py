"""Iterative graph operators on DataFrames: fixed-iteration PageRank.

Distributed PageRank in its textbook DataFrame decomposition (Page et
al. 1999; the Spark-examples formulation): per iteration,

  contrib — ranks join edges on src (shuffle on src, or none if ranks
            and edges share a partitioner), emit rank/outdeg per edge;
  gather  — groupBy dst sum(contrib) (ONE shuffle on dst — the only
            corpus-sized movement per round);
  apply   — right-join back to the node table (absent dst -> 0
            contribution) and damp.

State between rounds is the node-sized rank table only; the edge table
is pinned once and reused. At 100 TB of edges each round is one shuffle
of the edge contributions keyed by dst — pre-partitioning edges by dst
(or bucketing) makes the gather co-located.

Determinism contract (cross-engine oracle parity): simplified PageRank
`r' = (1-d)/N + d * sum(r[src]/outdeg[src])` with NO dangling-mass
redistribution (nodes without out-edges leak mass — the common
simplified form; deterministic and identical on both engines), ranks
rounded to 6 dp after every iteration so float summation order can
never diverge between engines (same device as operators/clustering.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import pin


def pagerank_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    small_state: bool = False,
    pin_rounds: bool = True,
) -> DataFrame:
    """PageRank with a fixed iteration count.

    ``nodes``: one column ``id`` (every vertex, including sinks).
    ``edges``: columns ``src``, ``dst`` (directed, deduplicated by the
    caller if multiplicity is not wanted).
    Returns (id, pr) with pr rounded to 6 dp.

    N (node count) is a 1-row aggregate broadcast into the rank seed and
    the damping term — never a driver-side collect.

    ``small_state=True`` broadcasts the rank table into the contrib join
    so the edge table NEVER moves (right whenever node count ≪ edge
    count and the state fits an executor — dimension-level graphs like
    the nation trade graph). With the default False, the contrib join
    shuffles on src — at billion-node scale the right layout is ranks
    and edges co-partitioned (bucketed) on src so that join is
    exchange-free too, leaving the dst gather as the only per-round
    shuffle either way.

    ``pin_rounds=False`` skips the per-round eager pin: the rank lineage
    is a LINEAR chain (each round references only the previous round and
    the one pinned edge table), so for small fixed iteration counts a
    single terminal action computes the whole chain in one job wave —
    fewer jobs, same plan per round. Keep the default True for long
    iteration runs, where a deep (if linear) lineage slows planning and
    loses restart points.
    """
    n_row = F.broadcast(nodes.agg(F.count("*").alias("n")))
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges_deg = pin(
        edges.join(deg, "src").select("src", "dst", "outdeg"),
        label="pagerank_edges",
    )
    maybe_pin = (lambda df, label: pin(df, label=label)) if pin_rounds else (
        lambda df, label: df
    )
    ranks = maybe_pin(
        nodes.crossJoin(n_row).select(
            "id", F.round(F.lit(1.0) / F.col("n"), 6).alias("pr")
        ),
        "pagerank_r0",
    )
    for _ in range(iters):
        r = F.broadcast(ranks) if small_state else ranks
        contrib = (
            r.join(edges_deg, ranks.id == edges_deg.src)
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = maybe_pin(
            nodes.join(contrib, nodes.id == contrib.dst, "left")
            .crossJoin(n_row)
            .select(
                "id",
                F.round(
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("contrib"), F.lit(0.0)),
                    6,
                ).alias("pr"),
            ),
            "pagerank_r",
        )
    return ranks
