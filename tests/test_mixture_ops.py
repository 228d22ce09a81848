"""Behavioral tests for the data-mix sampling operators: the properties
the oracle differential can't express (flattening direction, schedule
interleaving)."""

from __future__ import annotations

from airbnb_listings_reviews_data_engineering_spark.plans.sampling_ext import (
    sample_curriculum,
    sample_temperature,
)

SF_DIR = "/root/testdata/sf0.001"


def test_temperature_flattens_toward_uniform(spark):
    rows = sample_temperature(spark, SF_DIR).collect()
    assert rows
    total = sum(r.n_docs for r in rows)
    # T=2 keeps sqrt(share) of each domain: the dominant domain's share
    # of the SAMPLE must be strictly below its share of the corpus, and
    # every minority domain's sample rate must exceed the majority's
    # oversampling factor (rate_i / share_i decreasing in share).
    big = max(rows, key=lambda r: r.n_docs)
    small = min(rows, key=lambda r: r.n_docs)
    assert big.target_rate < 1.0
    big_boost = big.target_rate / (big.n_docs / total)
    small_boost = small.target_rate / (small.n_docs / total)
    assert small_boost > big_boost
    # realized counts respect the target rate direction (hash gate is
    # uniform; allow wide slack at tiny SF)
    assert big.n_sampled < big.n_docs


def test_curriculum_schedule_interleaves_buckets(spark):
    rows = sample_curriculum(spark, SF_DIR).collect()
    assert rows
    # sched_ord must be unique (a total order for the loader)
    ords = [r.sched_ord for r in rows]
    assert len(set(ords)) == len(ords)
    # and round-robin: among the first n_buckets schedule slots, no
    # bucket appears twice
    n_buckets = len({r.bucket for r in rows})
    first_cycle = sorted(rows, key=lambda r: r.sched_ord)[:n_buckets]
    assert len({r.bucket for r in first_cycle}) == n_buckets
    # pos is 1-based dense within bucket
    by_bucket: dict[int, list[int]] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r.pos)
    for poss in by_bucket.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
