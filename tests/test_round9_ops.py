"""Semantic invariants for the round-9 additions — properties the
oracle hash-match alone cannot state (the oracle proves Spark ==
DuckDB; these prove both engines compute the RIGHT thing).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_listings_reviews_data_engineering_spark.checkpoint import release_pins
from airbnb_listings_reviews_data_engineering_spark.plans import all_queries


@pytest.fixture(scope="module")
def q():
    return all_queries()


def rows(q, spark, sf_dir, key):
    out = q[key].fn(spark, sf_dir).collect()
    release_pins(spark)
    return out


# --- stream_dedup_span: live span-admission semantics ------------------------


def test_stream_span_admission_classes(q, spark, sf_dir):
    """The three incoming classes behave as constructed: short docs
    (id % 57) and fully-novel docs (id % 38) pass through untouched
    (n_removed = 0 — the explode_outer and left-join pass-through
    paths), while every copied-span doc loses EXACTLY the 12 copied
    tokens as ONE maximal span and keeps its 5 fresh prefix tokens."""
    out = rows(q, spark, sf_dir, "stream_dedup_span")
    assert out, "admission stream emitted nothing"
    by_class = {"short": [], "novel": [], "copied": []}
    for r in out:
        orig = r["doc_id"] - 300000
        assert orig % 19 == 0
        if orig % 57 == 0:
            by_class["short"].append(r)
        elif orig % 38 == 0:
            by_class["novel"].append(r)
        else:
            by_class["copied"].append(r)
    assert by_class["copied"], "fixture lost its true-duplicate class"
    for r in by_class["short"]:
        assert r["n_tok"] == 3 and r["n_removed"] == 0 and r["n_spans"] == 0
    for r in by_class["novel"]:
        assert r["n_tok"] == 7 and r["n_removed"] == 0 and r["n_spans"] == 0
        assert r["clean_text"].startswith("nv")
    for r in by_class["copied"]:
        # 5 fresh + up to 12 copied; a standing doc shorter than 12
        # tokens copies less, and below 6 copied tokens nothing excises
        copied = r["n_tok"] - 5
        if copied >= 6:
            assert r["n_removed"] == copied, r
            assert r["n_spans"] == 1, r
            assert r["clean_text"].split(" ") == [
                f"nv{r['doc_id'] - 300000}x{k}" for k in range(1, 6)
            ], r
        else:
            assert r["n_removed"] == 0, r


def test_stream_span_covers_every_incoming_doc(q, spark, sf_dir):
    """Admission must emit a verdict for EVERY incoming doc — a
    dropped doc is silent data loss at the pipeline gate."""
    from airbnb_listings_reviews_data_engineering_spark.plans.registry import load

    docs = load(spark, sf_dir, "documents")
    n_in = docs.filter(F.col("doc_id") % 19 == 0).count()
    out = rows(q, spark, sf_dir, "stream_dedup_span")
    assert len(out) == n_in
    assert len({r["doc_id"] for r in out}) == n_in


def test_span_excise_against_index_tiny(spark):
    """Hand-checkable: the standing corpus contributes its grams, the
    batch doc loses exactly the standing 6-run it contains, a clean
    batch doc passes through, and a short doc (no grams) survives
    explode_outer."""
    from airbnb_listings_reviews_data_engineering_spark.operators.dedup import (
        positional_gram_index,
        span_excise_against_index,
    )

    corpus = spark.createDataFrame(
        [(1, "c1 c2 c3 c4 c5 c6 c7 c8")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (10, "x1 x2 c1 c2 c3 c4 c5 c6 x3"),
            (11, "y1 y2 y3 y4 y5 y6 y7"),
            (12, "z1 z2"),
        ],
        ["doc_id", "text"],
    )
    idx = positional_gram_index(corpus, "text", n=6)
    got = {
        r["doc_id"]: r
        for r in span_excise_against_index(batch, idx, n=6).collect()
    }
    release_pins(spark)
    assert got[10]["clean_text"] == "x1 x2 x3"
    assert got[10]["n_removed"] == 6 and got[10]["n_spans"] == 1
    assert got[11]["n_removed"] == 0 and got[11]["clean_text"].startswith("y1")
    assert got[12]["n_removed"] == 0 and got[12]["n_tok"] == 2
    assert got[12]["clean_text"] == "z1 z2"
