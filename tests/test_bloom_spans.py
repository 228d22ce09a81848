"""Unit tests for the round-2 additions: Bloom-prefilter semi-join,
keep-best cluster resolution, shared-span dedup, and BM25 ranking.

The oracle differential (test_driver_oracle.py) already proves result
equality vs DuckDB; these tests pin the SCALE properties the oracle
can't see — that the Bloom filter actually prunes, that posting-list
caps actually cap, and that keep-best picks the documented winner.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_reviews_data_engineering_spark.operators import bloomjoin as B


def test_bloom_prefilter_prunes_and_is_exact(spark):
    # dim keys 0..49; fact keys 0..4999 -> only 1% truly match.
    dim = spark.range(50).select(F.col("id").alias("k"))
    fact = spark.range(5000).select(F.col("id").alias("k"), F.lit(1).alias("v"))

    bloom = B.build_bloom(dim, "k")
    pruned = (
        fact.crossJoin(F.broadcast(bloom))
        .filter(B.might_contain("bloom", "k", 1 << 16, 5))
        .drop("bloom")
    )
    n_pruned = pruned.count()
    # no false negatives: every true match survives the prefilter
    assert n_pruned >= 50
    # the filter must actually prune: with m=65536 bits for 50 keys the
    # false-positive rate is ~0, so survivors ~= true matches
    assert n_pruned < 200

    got = sorted(
        r.k for r in B.bloom_prefilter_semi_join(fact, dim, "k", "k").collect()
    )
    assert got == list(range(50))


def test_bloom_filter_is_one_row_map(spark):
    dim = spark.range(1000).select(F.col("id").alias("k"))
    rows = B.build_bloom(dim, "k", m_bits=1 << 16, k=5).collect()
    assert len(rows) == 1
    bloom = rows[0].bloom
    # sparse words only — bounded by m_bits/64 regardless of dim size
    assert 0 < len(bloom) <= (1 << 16) // 64


def test_keep_best_prefers_longest_member(spark):
    from airbnb_listings_reviews_data_engineering_spark.plans.pipeline_ext import (
        dedup_keep_best,
    )

    kept = dedup_keep_best(spark, "/root/testdata/sf0.001").collect()
    by_comp: dict[int, list] = {}
    for r in kept:
        by_comp.setdefault(r.component, []).append(r)
    # one survivor per component
    assert all(len(v) == 1 for v in by_comp.values())
    # variants drop their first token, so whenever an original+variant
    # pair clustered, the ORIGINAL (doc_id < 100000, longer) must win
    originals = {r.doc_id for r in kept if r.doc_id < 100_000}
    for r in kept:
        if r.doc_id >= 100_000:
            # a surviving variant means its original wasn't in the same
            # cluster (LSH miss) — fine; but it can never have beaten it
            assert (r.doc_id - 100_000) not in {
                k.doc_id for k in kept if k.component == r.component
            }
    assert originals  # sanity: originals do survive


def test_shared_spans_df_cap_blocks_boilerplate(spark):
    """A span shared by MORE than the cap must emit no candidates from
    that span alone — the quadratic-blowup guard."""
    from airbnb_listings_reviews_data_engineering_spark.plans.pipeline_ext import (
        _SPAN_DF_CAP,
        _SPAN_MIN_SHARED,
        _SPAN_W,
    )

    boiler = " ".join(f"b{i}" for i in range(_SPAN_W))
    n_docs = _SPAN_DF_CAP + 10
    rows = [(i, f"{boiler} unique{i} tail{i}") for i in range(n_docs)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    spans = (
        docs.withColumn("tok", F.split("text", " "))
        .filter(F.size("tok") >= _SPAN_W)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(tok) - {_SPAN_W}), i -> "
                    "cast(conv(substr(md5(concat_ws(' ', "
                    f"slice(tok, i + 1, {_SPAN_W}))), 1, 15), 16, 10) as bigint))"
                )
            ).alias("h"),
        )
        .distinct()
    )
    keep = (
        spans.groupBy("h")
        .agg(F.count("*").alias("pdf"))
        .filter((F.col("pdf") >= 2) & (F.col("pdf") <= _SPAN_DF_CAP))
    )
    # every shared span here is boilerplate shared by cap+10 docs ->
    # the cap removes them all; candidate join input is empty
    assert keep.count() == 0
    assert _SPAN_MIN_SHARED >= 1


def test_bm25_ranks_term_rich_docs_first(spark):
    from airbnb_listings_reviews_data_engineering_spark.plans.pipeline_ext import (
        text_bm25,
    )

    top = text_bm25(spark, "/root/testdata/sf0.001").collect()
    assert len(top) > 0
    scores = [r.bm25 for r in top]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_incremental_dedup_separates_variants_from_new_docs(spark):
    from airbnb_listings_reviews_data_engineering_spark.plans.pipeline_ext import (
        dedup_incremental,
    )

    rows = dedup_incremental(spark, "/root/testdata/sf0.001").collect()
    variants = [r for r in rows if r.batch_id < 200_000]
    new_docs = [r for r in rows if r.batch_id >= 200_000]
    assert variants and new_docs
    # most first-token-dropped variants must match their original
    dup_rate_var = sum(r.is_dup for r in variants) / len(variants)
    dup_rate_new = sum(r.is_dup for r in new_docs) / len(new_docs)
    assert dup_rate_var > 0.5
    # genuinely-new docs collide far less than true variants
    assert dup_rate_new < dup_rate_var
    # a matched variant's best match is its own original when flagged
    for r in variants:
        if r.is_dup and r.best_match == r.batch_id - 100_000:
            break
    else:
        raise AssertionError("no variant matched its own original")
