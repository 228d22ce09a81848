"""Recall floors for the ANN operators vs exact kNN ground truth
(VERDICT r2 "Next round" #1).

The floors are the ISOTROPIC worst case (the driver embeddings have no
cluster structure — recall ~= corpus fraction probed; see SCALING.md's
measured table, where the clustered blow-up sits 2-4x higher at the
same budgets). Invariants pinned:

- nprobe=K probes every cell -> EXACT by construction (recall == 1.0);
- recall is monotone in the probe budget (nprobe, bit-flip ring);
- each budget's recall stays above a floor set ~0.1 under the measured
  value (sf0.001: 500 vectors, 25 queries — sampling noise bounded by
  250 GT rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_listings_reviews_data_engineering_spark.checkpoint import release_pins
from airbnb_listings_reviews_data_engineering_spark.functions.arrays import (
    as_double_array,
)
from airbnb_listings_reviews_data_engineering_spark.operators import similarity as S
from airbnb_listings_reviews_data_engineering_spark.plans.registry import load

K = 10


@pytest.fixture(scope="module")
def ann_fixture(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("q_id"), as_double_array("embedding").alias("qv")
    )
    cents = emb.filter(F.col("vec_id").between(1, 8)).select(
        F.col("vec_id").cast("int").alias("cell"),
        as_double_array("embedding").alias("cv"),
    )
    planes = emb.filter(F.col("vec_id").between(1, 8)).select(
        F.col("vec_id").cast("int").alias("pid"), "embedding"
    )
    gt = {
        (r["q_id"], r["vec_id"])
        for r in S.knn_join(emb, queries, "vec_id", "embedding", k=K).collect()
    }
    yield emb, queries, cents, planes, gt
    release_pins(spark)


def _recall(ann_rows, gt) -> float:
    got = {(r["q_id"], r["vec_id"]) for r in ann_rows}
    return len(got & gt) / len(gt)


def test_ivf_recall_floor_and_monotone(ann_fixture):
    emb, queries, cents, planes, gt = ann_fixture
    floors = {1: 0.15, 2: 0.30, 4: 0.55, 8: 1.0}
    prev = 0.0
    for nprobe, floor in floors.items():
        r = _recall(
            S.ivf_topk_join(
                emb, queries, "vec_id", "embedding", cents, k=K, nprobe=nprobe
            ).collect(),
            gt,
        )
        assert r >= floor, f"IVF nprobe={nprobe}: recall {r:.3f} < floor {floor}"
        assert r >= prev - 1e-9, f"IVF recall not monotone at nprobe={nprobe}"
        prev = r


def test_ivf_full_probe_is_exact(ann_fixture):
    """Probing every cell is brute force — must equal exact kNN."""
    emb, queries, cents, planes, gt = ann_fixture
    rows = S.ivf_topk_join(
        emb, queries, "vec_id", "embedding", cents, k=K, nprobe=8
    ).collect()
    assert _recall(rows, gt) == 1.0


def test_ivf_full_probe_exact_with_learned_centroids(ann_fixture, spark, sf_dir):
    """The nprobe=K exactness invariant must hold for ANY centroid set,
    including Lloyd-learned ones (scripts/ann_recall.py's real-IVF rows)
    — probing every cell is brute force regardless of where the cells
    came from."""
    from airbnb_listings_reviews_data_engineering_spark.operators.clustering import (
        kmeans_fixed,
    )

    emb, queries, cents, planes, gt = ann_fixture
    dims = len(emb.select("embedding").first()[0])
    km = kmeans_fixed(emb, "vec_id", "embedding", k=8, dims=dims, iters=2)
    km_cents = km.select(
        F.col("cid").cast("int").alias("cell"),
        F.array(*[F.col(f"c{d + 1}") for d in range(dims)]).alias("cv"),
    )
    rows = S.ivf_topk_join(
        emb, queries, "vec_id", "embedding", km_cents, k=K, nprobe=8
    ).collect()
    assert _recall(rows, gt) == 1.0


def test_lsh_multiprobe_recall_floor_and_monotone(ann_fixture):
    emb, queries, cents, planes, gt = ann_fixture
    floors = {0: 0.03, 1: 0.08, 2: 0.20}
    prev = 0.0
    for flips, floor in floors.items():
        r = _recall(
            S.lsh_topk_join(
                emb, queries, "vec_id", "embedding", planes, "pid", 8, k=K,
                flips=flips,
            ).collect(),
            gt,
        )
        assert r >= floor, f"LSH flips={flips}: recall {r:.3f} < floor {floor}"
        assert r >= prev - 1e-9, f"LSH recall not monotone at flips={flips}"
        prev = r


def test_ivf_assign_matches_window_formulation(spark, sf_dir):
    """The map-side argmax assignment (array_max over broadcast centroid
    array) must agree exactly with the window-formulation cell choice
    used by the registered sim_ivf_topk oracle (round-6dp scores,
    lowest-cell tie-break)."""
    from pyspark.sql import Window as W

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    cents = emb.filter(F.col("vec_id").between(1, 8)).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("v").alias("cv")
    )
    fast = S.ivf_assign(emb, "vec_id", "v", cents).select("vec_id", "cell")

    from airbnb_listings_reviews_data_engineering_spark.functions.arrays import cosine

    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cell",
        F.round(cosine(F.col("v"), F.col("cv")), 6).alias("cos_c"),
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos_c"), "cell")
    ref = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, ref.collect()))
