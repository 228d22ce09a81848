"""Precision/recall floors for MinHash-LSH vs exact n-gram Jaccard
(VERDICT r2 "Next round" #8 — the dedup twin of test_ann_recall.py).

Fixture: prefix-truncated variants whose true Jaccard sweeps the
[0.2, 0.95] range, so pairs genuinely straddle the 0.5 threshold (the
one-word-dropped fixture puts every pair at J~0.97 and any budget
scores a meaningless 1.0/1.0). Ground truth is the prefix-filtered
AllPairs exact join — zero false negatives at the threshold by the
prefix-filtering theorem. Floors sit ~0.1 under the measured sf0.001
values (8h/4b: p=0.836 r=0.876; 16h/8b: p=0.881 r=0.948); recall must
not degrade when the signature budget doubles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_listings_reviews_data_engineering_spark.checkpoint import release_pins
from airbnb_listings_reviews_data_engineering_spark.operators import dedup as D

THRESHOLD = 0.5
SHINGLE = 3


@pytest.fixture(scope="module")
def quality(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    variants = base.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.expr(
            "concat_ws(' ', slice(split(text, ' '), 1, greatest(3, "
            "cast(size(split(text, ' ')) * (0.30 + (doc_id % 65) / 100.0) "
            "as int))))"
        ).alias("text"),
    )
    corpus = base.unionByName(variants)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(
            corpus, "doc_id", "text", shingle=SHINGLE, threshold=THRESHOLD
        ).collect()
    }
    assert len(exact) > 100  # the fixture must generate real work

    def measure(num_hashes: int, bands: int) -> tuple[float, float]:
        lsh = {
            (r["doc_a"], r["doc_b"])
            for r in D.minhash_lsh_pairs(
                corpus,
                "doc_id",
                "text",
                num_hashes=num_hashes,
                bands=bands,
                threshold=THRESHOLD,
                shingle=SHINGLE,
            ).collect()
        }
        tp = len(lsh & exact)
        return tp / len(lsh), tp / len(exact)

    yield measure
    release_pins(spark)


def test_default_budget_floor(quality):
    p, r = quality(8, 4)
    assert p >= 0.70, f"8h/4b precision {p:.3f} below floor"
    assert r >= 0.75, f"8h/4b recall {r:.3f} below floor"


def test_doubled_budget_tightens(quality):
    p8, r8 = quality(8, 4)
    p16, r16 = quality(16, 8)
    assert p16 >= 0.75 and r16 >= 0.85
    # sampling noise allowance: doubling the budget must not LOSE quality
    assert r16 >= r8 - 0.05
    assert p16 >= p8 - 0.05
