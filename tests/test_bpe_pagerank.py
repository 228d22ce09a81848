"""Unit tests for BPE merge training and fixed-iteration PageRank on
crafted inputs with hand-computed expected results, plus the documented
merge-semantics edge case (self-overlapping runs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_listings_reviews_data_engineering_spark.operators.bpe import (
    bpe_segmented_vocab,
    bpe_train,
    word_frequencies,
)
from airbnb_listings_reviews_data_engineering_spark.operators.graph import (
    pagerank_fixed,
)


def _words(spark, rows):
    return spark.createDataFrame(rows, "word string, freq long")


def test_bpe_learns_most_frequent_pair_first(spark):
    # 'ab' appears in both words; freq-weighted (a,b) count = 10+5 = 15
    words = _words(spark, [("abc", 10), ("abd", 5), ("xyz", 1)])
    merges = bpe_train(words, merges=2).orderBy("rank").collect()
    assert (merges[0].lhs, merges[0].rhs, merges[0].cnt) == ("a", "b", 15)
    # after merging 'ab', the best remaining pair is (ab, c) with count 10
    assert (merges[1].lhs, merges[1].rhs, merges[1].merged) == ("ab", "c", "abc")
    assert merges[1].cnt == 10


def test_bpe_tie_break_is_lexicographic(spark):
    # (a,b) and (c,d) both have count 7 -> (a,b) wins on the l,r tie-break
    words = _words(spark, [("ab", 7), ("cd", 7)])
    first = bpe_train(words, merges=1).collect()[0]
    assert (first.lhs, first.rhs) == ("a", "b")


def test_bpe_self_overlapping_run_semantics(spark):
    # documented non-canonical case: 'aaaa' merges to [aa, a, a], NOT
    # [aa, aa] — the consumed sentinel space blocks the adjacent re-match
    # (operators/bpe.py module docstring)
    words = _words(spark, [("aaaa", 3)])
    vocab = bpe_segmented_vocab(words, merges=1).collect()[0]
    assert vocab.pieces == ["aa", "a", "a"]


def test_bpe_vocab_segments_consistently_with_merges(spark):
    words = _words(spark, [("abc", 10), ("abd", 5), ("xyz", 1)])
    vocab = {
        r.word: r.pieces for r in bpe_segmented_vocab(words, merges=2).collect()
    }
    assert vocab["abc"] == ["abc"]
    assert vocab["abd"] == ["ab", "d"]
    assert vocab["xyz"] == ["x", "y", "z"]


def test_word_frequencies_filters_non_alpha(spark):
    docs = spark.createDataFrame(
        [(1, "foo bar foo x1 BAR")], "doc_id long, text string"
    )
    out = {r.word: r.freq for r in word_frequencies(docs, "text").collect()}
    assert out == {"foo": 2, "bar": 1}  # 'x1' and 'BAR' rejected


def _graph(spark, nodes, edges):
    n = spark.createDataFrame([(i,) for i in nodes], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return n, e


def test_pagerank_symmetric_cycle_is_uniform(spark):
    # 3-cycle: stationary distribution is uniform; every iteration keeps 1/3
    n, e = _graph(spark, [0, 1, 2], [(0, 1), (1, 2), (2, 0)])
    out = {r.id: r.pr for r in pagerank_fixed(n, e, iters=3).collect()}
    assert out == {0: pytest.approx(1 / 3, abs=2e-6),
                   1: pytest.approx(1 / 3, abs=2e-6),
                   2: pytest.approx(1 / 3, abs=2e-6)}


def test_pagerank_sink_gets_more_mass(spark):
    # star into node 0: 0 accumulates, leaves keep only the damping floor
    n, e = _graph(spark, [0, 1, 2, 3], [(1, 0), (2, 0), (3, 0)])
    out = {r.id: r.pr for r in pagerank_fixed(n, e, iters=1).collect()}
    # r0 = 0.25 each; r1[0] = 0.15/4 + 0.85*(3*0.25) = 0.675
    assert out[0] == pytest.approx(0.675, abs=1e-6)
    assert out[1] == pytest.approx(0.0375, abs=1e-6)


def test_pagerank_one_iteration_hand_computed(spark):
    # 0 -> 1, 0 -> 2, 1 -> 2 ; N=3, r0 = 1/3
    # r1[0] = 0.05 ; r1[1] = 0.05 + 0.85*(1/3/2) = 0.191667
    # r1[2] = 0.05 + 0.85*(1/3/2 + 1/3/1) = 0.475
    n, e = _graph(spark, [0, 1, 2], [(0, 1), (0, 2), (1, 2)])
    out = {r.id: r.pr for r in pagerank_fixed(n, e, iters=1).collect()}
    assert out[0] == pytest.approx(0.05, abs=1e-6)
    assert out[1] == pytest.approx(0.191667, abs=1e-6)
    assert out[2] == pytest.approx(0.475, abs=1e-6)


def test_bpe_invariants_on_random_vocab(spark):
    """Invariants on a randomized vocabulary (no oracle involved):
    segmentation is lossless (concat(pieces) == word), piece counts
    never increase with more merges, and learned merge counts are
    non-increasing in rank (any post-merge pair count is bounded by the
    count of the pair it replaced)."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        vocab = {
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7))): rng.randint(1, 50)
            for _ in range(rng.randint(3, 15))
        }
        words = _words(spark, list(vocab.items()))
        v2 = {r.word: r.pieces for r in bpe_segmented_vocab(words, merges=2).collect()}
        v4 = {r.word: r.pieces for r in bpe_segmented_vocab(words, merges=4).collect()}
        assert set(v2) == set(vocab) and set(v4) == set(vocab)
        for w in vocab:
            assert "".join(v2[w]) == w, (trial, w, v2[w])
            assert "".join(v4[w]) == w, (trial, w, v4[w])
            assert len(v4[w]) <= len(v2[w])
        counts = [r.cnt for r in bpe_train(words, merges=4).orderBy("rank").collect()]
        assert counts == sorted(counts, reverse=True), counts
