"""Semantic invariants for the round-9 additions — properties the
oracle hash-match alone cannot state (the oracle proves Spark ==
DuckDB; these prove both engines compute the RIGHT thing).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from airbnb_listings_reviews_data_engineering_spark.checkpoint import release_pins
from airbnb_listings_reviews_data_engineering_spark.operators import dedup as D
from airbnb_listings_reviews_data_engineering_spark.plans import all_queries

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q():
    return all_queries()


def rows(q, spark, sf_dir, key):
    out = q[key].fn(spark, sf_dir).collect()
    release_pins(spark)
    return out


def _components(spark, edges, fn, **kw):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = {r.node: r.component for r in fn(pairs, **kw).collect()}
    rounds = D.LAST_CC_ROUNDS
    release_pins(spark)
    return out, rounds


def _chain_edges(n, seed=9):
    """A path graph over n nodes with PERMUTED ids — the adversarial
    shape for min-label propagation (sliding-window chunk output where
    doc i overlaps doc i+1). Permutation matters: with monotone ids the
    min label sits at one end and labelprop's round count is exactly
    the diameter; permuting ids keeps the diameter n-1 while making the
    min's eccentricity generic."""
    ids = list(range(n))
    random.Random(seed).shuffle(ids)
    return [(ids[i], ids[i + 1]) for i in range(n - 1)]


# --- alternating-star CC: identical output, O(log) rounds --------------------


def test_cc_star_equals_labelprop_on_chain(spark):
    edges = _chain_edges(24)
    star, star_rounds = _components(spark, edges, D.connected_components)
    prop, prop_rounds = _components(
        spark, edges, D.connected_components_labelprop, max_iter=40
    )
    assert star == prop
    assert set(star.values()) == {0} and len(star) == 24
    # the headline claim: rounds ~ log(n) for the star form vs
    # ~ eccentricity-of-the-min for label propagation
    assert star_rounds < prop_rounds
    assert star_rounds <= 8


def test_cc_star_equals_labelprop_on_random_graph(spark):
    rng = random.Random(17)
    nodes = list(range(100, 200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(60)
    ] + [(n, n) for n in nodes]  # self-pairs keep isolated nodes in play
    star, _ = _components(spark, edges, D.connected_components)
    prop, _ = _components(
        spark, edges, D.connected_components_labelprop, max_iter=40
    )
    assert star == prop
    # every component is labeled by its minimum member
    by_comp: dict[int, list[int]] = {}
    for n, c in star.items():
        by_comp.setdefault(c, []).append(n)
    for c, members in by_comp.items():
        assert c == min(members)


def test_cc_star_long_chain_within_default_budget(spark):
    # diameter 199: labelprop's default budget (max_iter=15) provably
    # cannot finish this; the star form must — that is the upgrade.
    star, rounds = _components(spark, _chain_edges(200), D.connected_components)
    assert set(star.values()) == {0} and len(star) == 200
    assert rounds <= 15


def test_cc_star_islands_and_selfloops(spark):
    edges = [(5, 3), (3, 8), (21, 20), (30, 30)]
    star, _ = _components(spark, edges, D.connected_components)
    assert star == {3: 3, 5: 3, 8: 3, 20: 20, 21: 20, 30: 30}


# --- mm_pair_dedup: the intersection must do real work -----------------------


def test_mm_pair_dedup_each_modality_vetoes(spark, q):
    both = {
        (r.pair_a, r.pair_b) for r in rows(q, spark, SF_SMALL, "mm_pair_dedup")
    }
    img = {
        (r.doc_a, r.doc_b) for r in rows(q, spark, SF_SMALL, "mm_phash_dedup")
    }
    # rebuild the caption side alone (same corpus construction as the key)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.select(
        F.explode(
            F.array(
                F.struct(
                    (F.col("doc_id") * 2).alias("pair_id"),
                    F.col("text").alias("caption"),
                ),
                F.struct(
                    (F.col("doc_id") * 2 + 1).alias("pair_id"),
                    F.when(
                        F.col("doc_id") % 3 == 0,
                        F.array_join(F.reverse(F.split("text", " ")), " "),
                    )
                    .otherwise(F.regexp_replace("text", r"^[a-z]+ ", ""))
                    .alias("caption"),
                ),
            )
        ).alias("p")
    ).select("p.pair_id", "p.caption")
    cap = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_pairs(
            corpus, "pair_id", "caption", num_hashes=8, bands=4, threshold=0.5
        ).collect()
    }
    release_pins(spark)
    # the composite is exactly the intersection of the two blocking joins
    assert both == (img & cap)
    # and BOTH modalities veto a nonempty subset: image-only matches
    # (word-reversed captions on identical images) and caption-only
    # matches (heavy cell flips on near-identical captions) exist
    assert img - cap, "caption leg never vetoed an image match"
    assert cap - img, "image leg never vetoed a caption match"


def test_mm_pair_dedup_planted_semantics(spark, q):
    out = {
        (r.pair_a, r.pair_b): r
        for r in rows(q, spark, SF_SMALL, "mm_pair_dedup")
    }
    # pin the two veto directions on explicit planted examples
    # (note d%6==0 implies d%3==0, so every identical-image pair has a
    # reversed caption in this fixture — there is no both-trivially-
    # matching d%6==0 survivor to check):
    # d % 6 == 0 (image hamming 0, in img) but d % 3 == 0 (caption
    # reversed) -> must NOT be in the composite
    for d in (6, 12, 18, 24):
        assert (2 * d, 2 * d + 1) not in out
    # d % 6 == 1 (one flipped cell -> hamming <= 2) and d % 3 != 0
    # -> caption is a drop-first-word near-dup: must be IN the composite
    for d in (1, 7, 13, 19):
        assert (2 * d, 2 * d + 1) in out
        assert out[(2 * d, 2 * d + 1)].hamming <= 3
        assert out[(2 * d, 2 * d + 1)].est_jaccard >= 0.5


# --- ml_quality_distill: the distilled filter must actually learn ------------


def test_quality_distill_learns_above_majority(spark, q):
    r = rows(q, spark, "/root/testdata/sf0.01", "ml_quality_distill")[0]
    majority = max(r.rules_pass_rate_test, 1.0 - r.rules_pass_rate_test)
    # held-out agreement with the rule battery far above the majority
    # baseline — the distilled filter learned the rules, not the prior
    assert r.test_agree >= majority + 0.2
    assert r.n_train > r.n_test > 0
    # the disagreement profile is the whole point of the key: both
    # counts reported, and they reconcile with the agreement rate
    assert r.n_false_pass + r.n_false_drop == round(
        (1.0 - r.test_agree) * r.n_test
    )
    # the learned boundary must lean on BOTH cheap features (the label
    # is an AND of thresholds on them)
    assert r.w_ntok > 0 and r.w_stop > 0


# --- deterministic sketches: contracts the hash-match cannot state -----------


def test_kmv_ndv_error_bound(spark, q):
    out = rows(q, spark, "/root/testdata/sf0.01", "sketch_kmv_ndv")
    assert len(out) == 5
    for r in out:
        assert r.ndv_est > 0
        # measured small-register regime at sf0.01 tops out at 0.23;
        # 0.3 leaves headroom without letting a broken estimator pass
        assert r.rel_err <= 0.3, (r.prio, r.rel_err)


def test_theta_setops_algebra(spark, q):
    r = rows(q, spark, "/root/testdata/sf0.01", "sketch_theta_setops")[0]
    # inclusion-exclusion holds EXACTLY on both sides: the sample is a
    # fixed subset of the key universe, so set algebra commutes with it
    assert r.est_union == r.est_a + r.est_b - r.est_inter
    assert r.n_exact_union == r.n_exact_a + r.n_exact_b - r.n_exact_inter
    # estimates are multiples of the rate and within sampling error
    for est, exact in (
        (r.est_a, r.n_exact_a),
        (r.est_b, r.n_exact_b),
        (r.est_union, r.n_exact_union),
        (r.est_inter, r.n_exact_inter),
    ):
        assert est % 16 == 0
        assert abs(est - exact) / exact <= 0.35


def test_countmin_one_sided_and_bounded(spark, q):
    out = rows(q, spark, "/root/testdata/sf0.01", "sketch_countmin_heavy")
    assert len(out) > 0
    # the count-min guarantee: NEVER an underestimate
    assert all(r.n_est >= r.n_exact for r in out)
    # and the overestimate is bounded in distribution: >= 75% of probes
    # within e*N/w (Markov per row ^ d rows leaves ~5% tail per probe)
    n_stream = 15000
    bound = 2.718281828 * n_stream / 4096
    within = sum(1 for r in out if r.n_est - r.n_exact <= bound)
    assert within / len(out) >= 0.75


def test_stream_sketch_ndv_equals_batch(spark, q):
    # the streaming micro-batch path must produce the IDENTICAL sketch:
    # register minima merge associatively, so 3 batches == one batch
    stream = {
        r.prio: (r.n_exact, r.ndv_est, r.rel_err)
        for r in rows(q, spark, "/root/testdata/sf0.01", "stream_sketch_ndv")
    }
    batch = {
        r.prio: (r.n_exact, r.ndv_est, r.rel_err)
        for r in rows(q, spark, "/root/testdata/sf0.01", "sketch_kmv_ndv")
    }
    assert stream == batch


def test_profile_sketch_card_small_range_exact(spark, q):
    out = {
        r.col: r for r in rows(
            q, spark, "/root/testdata/sf0.01", "profile_sketch_card"
        )
    }
    assert set(out) == {
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority", "o_orderdate",
    }
    # linear-counting regime: tiny cardinalities come back EXACT
    assert out["o_orderstatus"].ndv_est == out["o_orderstatus"].n_exact == 3
    assert out["o_orderpriority"].ndv_est == out["o_orderpriority"].n_exact == 5
    # harmonic regime: large cardinalities within the ~1.3/sqrt(K) band
    for col in ("o_orderkey", "o_custkey", "o_orderdate"):
        assert out[col].rel_err <= 0.3, (col, out[col].rel_err)


def test_quantile_sample_rank_guarantee(spark, q):
    out = rows(q, spark, "/root/testdata/sf0.01", "sketch_quantile_sample")
    assert len(out) == 3  # one row per l_returnflag
    for r in out:
        # sample is ~n/64, nonempty, and much smaller than the table
        assert 0 < r.n_sample < r.n / 16
        # the TRUE rank error of the sample median, measured on the
        # full table, concentrates at ~1/(2*sqrt(ns))
        assert r.rank_err <= 3.0 / (2.0 * r.n_sample ** 0.5), (
            r.l_returnflag, r.rank_err, r.n_sample,
        )


# --- incremental CC: merging a batch must equal the full recompute -----------


def test_cc_incremental_merges_and_preserves(spark):
    # standing: {1,2,3} (label 1), {10,11} (label 10), {20,21} (label 20)
    old_edges = [(1, 2), (2, 3), (10, 11), (20, 21)]
    old = spark.createDataFrame(old_edges, "doc_a long, doc_b long")
    standing = D.connected_components(old)
    # batch: bridge 3-10 (merges two standing components), a brand-new
    # chain 30-31-32, and a new node attaching to a standing one (21-40)
    new_edges = [(3, 10), (30, 31), (31, 32), (40, 21)]
    new = spark.createDataFrame(new_edges, "doc_a long, doc_b long")
    inc = {
        r.node: r.component
        for r in D.connected_components_incremental(standing, new).collect()
    }
    full = {
        r.node: r.component
        for r in D.connected_components(
            spark.createDataFrame(
                old_edges + new_edges, "doc_a long, doc_b long"
            )
        ).collect()
    }
    release_pins(spark)
    assert inc == full
    # merged: 1..3 + 10,11 -> 1; untouched: 20,21 keep 20 BUT 40 joins;
    # fresh chain labeled by its min
    assert inc[11] == 1 and inc[3] == 1
    assert inc[40] == 20 and inc[21] == 20
    assert inc[30] == inc[31] == inc[32] == 30


def test_cc_incremental_untouched_components_unchanged(spark):
    old = spark.createDataFrame(
        [(5, 6), (7, 8)], "doc_a long, doc_b long"
    )
    standing = D.connected_components(old)
    new = spark.createDataFrame([(100, 101)], "doc_a long, doc_b long")
    inc = {
        r.node: r.component
        for r in D.connected_components_incremental(standing, new).collect()
    }
    release_pins(spark)
    assert inc == {5: 5, 6: 5, 7: 7, 8: 7, 100: 100, 101: 100}


def test_theta_bottomk_estimates(spark, q):
    r = rows(q, spark, "/root/testdata/sf0.1", "sketch_theta_bottomk")[0]
    # k=128 bottom-k: every estimate within ~3/sqrt(k-2) of exact
    for est, exact in (
        (r.est_a, r.n_exact_a),
        (r.est_b, r.n_exact_b),
        (r.est_union, r.n_exact_union),
        (r.est_inter, r.n_exact_inter),
    ):
        assert abs(est - exact) / exact <= 0.3, (est, exact)
    # theta algebra sanity: union <= a + b, inter <= min(a, b)
    assert r.est_union <= r.est_a + r.est_b
    assert r.est_inter <= min(r.est_a, r.est_b)


def test_admission_funnel_every_fate_planted(spark, q):
    r = rows(
        q, spark, "/root/testdata/sf0.01", "pipeline_admission_funnel"
    )[0]
    # the planted batch separates PERFECTLY at sf0.01: every exact copy
    # caught by the hash gate, every drop-first-word variant by the
    # MinHash veto, every junk doc by the rule battery, every
    # synthesized good doc admitted — the counts are exactly the
    # planted class populations (doc_id multiples of 13/7/11/17 < 500)
    assert r.n_exact_dup == sum(1 for d in range(500) if d % 13 == 0)
    assert r.n_near_dup == sum(1 for d in range(500) if d % 7 == 0)
    assert r.n_quality_rejected == sum(1 for d in range(500) if d % 11 == 0)
    assert r.n_admitted == sum(1 for d in range(500) if d % 17 == 0)
    assert r.n_incoming == (
        r.n_exact_dup + r.n_near_dup + r.n_quality_rejected + r.n_admitted
    )


def test_countmin_rollup_merge_equals_direct(spark, q):
    # count-min is LINEAR: monthly grids merged by cell-wise addition
    # must answer probes identically to the direct single-pass build
    merged = {
        r.custkey: (r.n_exact, r.n_est)
        for r in rows(
            q, spark, "/root/testdata/sf0.01", "sketch_countmin_rollup"
        )
    }
    direct = {
        r.custkey: (r.n_exact, r.n_est)
        for r in rows(
            q, spark, "/root/testdata/sf0.01", "sketch_countmin_heavy"
        )
    }
    assert merged == direct


# --- randomized equivalence: the CC swap and the incremental merge -----------


def test_cc_star_equals_labelprop_randomized(spark):
    for seed in (3, 11, 29):
        rng = random.Random(seed)
        nodes = list(range(1000, 1080))
        edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(50)]
        star, _ = _components(spark, edges, D.connected_components)
        prop, _ = _components(
            spark, edges, D.connected_components_labelprop, max_iter=90
        )
        assert star == prop, f"seed {seed}"


def test_cc_incremental_equals_full_randomized(spark):
    for seed in (7, 23):
        rng = random.Random(seed)
        nodes = list(range(2000, 2060))
        edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(40)]
        cut = len(edges) * 2 // 3
        old = spark.createDataFrame(edges[:cut], "doc_a long, doc_b long")
        new = spark.createDataFrame(edges[cut:], "doc_a long, doc_b long")
        standing = D.connected_components(old)
        inc = {
            r.node: r.component
            for r in D.connected_components_incremental(
                standing, new
            ).collect()
        }
        full = {
            r.node: r.component
            for r in D.connected_components(
                spark.createDataFrame(edges, "doc_a long, doc_b long")
            ).collect()
        }
        release_pins(spark)
        assert inc == full, f"seed {seed}"
