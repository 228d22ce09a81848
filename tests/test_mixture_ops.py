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


def test_dsir_selects_target_like_docs(spark):
    from airbnb_listings_reviews_data_engineering_spark.plans.sampling_ext import (
        _DSIR_N,
        _DSIR_TARGET,
        sample_dsir,
    )

    rows = sample_dsir(spark, SF_DIR).collect()
    assert 0 < len(rows) <= _DSIR_N
    # the target proxy corpus itself is never in the resample
    assert all(r.source != _DSIR_TARGET for r in rows)
    # deterministic: same selection on a second run (hash-gate Gumbel,
    # no RNG state)
    again = sample_dsir(spark, SF_DIR).collect()
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in again)
    # importance resampling must pull the sample toward the target: the
    # sampled docs' mean log-weight exceeds the raw-pool mean (Gumbel
    # noise is O(1) while logw spreads over tens of nats). Pool stats
    # come from the registered oracle's own CTE (DuckDB), so the test
    # does not re-derive the weight model in a second Spark path.
    if len(rows) == _DSIR_N:  # pool large enough to leave a remainder
        import duckdb

        from airbnb_listings_reviews_data_engineering_spark.plans.sampling_ext import (
            _DSIR_SQL,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        pool_sql = _DSIR_SQL[: _DSIR_SQL.rindex("SELECT")] \
            + "SELECT avg(logw) FROM keyed"
        pool_mean = con.execute(pool_sql).fetchone()[0]
        sel_mean = sum(r.logw for r in rows) / len(rows)
        assert sel_mean > pool_mean


def test_perplexity_buckets_partition_each_lang(spark):
    from airbnb_listings_reviews_data_engineering_spark.plans.pipeline_ext import (
        text_perplexity_bucket,
    )

    rows = text_perplexity_bucket(spark, SF_DIR).collect()
    assert rows
    by_lang: dict[str, dict[str, object]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, buckets in by_lang.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        # tercile cuts order the buckets on the score axis:
        # head.hi <= c1 < middle.lo and middle.hi <= c2 < tail.lo
        if "head" in buckets and "middle" in buckets:
            assert buckets["head"].hi <= buckets["middle"].lo, lang
        if "middle" in buckets and "tail" in buckets:
            assert buckets["middle"].hi <= buckets["tail"].lo, lang
        if "head" in buckets and "tail" in buckets:
            assert buckets["head"].hi <= buckets["tail"].lo, lang
    # bucket doc counts add up to the corpus (every doc lands somewhere)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    assert sum(r.n_docs for r in rows) == n_docs


def test_doremi_excess_loss_and_weights(spark):
    from airbnb_listings_reviews_data_engineering_spark.plans.sampling_ext import (
        sample_doremi_weights,
    )

    rows = sample_doremi_weights(spark, SF_DIR).collect()
    assert rows
    # Gibbs' inequality: cross-entropy of the corpus LM on a domain is
    # >= the domain's own entropy, so excess >= 0 everywhere (0 only if
    # the domain's unigram distribution equals the corpus's)
    assert all(r.excess >= 0 for r in rows), rows
    # weights are a normalized distribution over domains
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-2
    assert all(r.weight > 0 for r in rows)
    # the most distinctive domain gets the largest weight (monotone in
    # excess by construction)
    by_excess = max(rows, key=lambda r: r.excess)
    by_weight = max(rows, key=lambda r: r.weight)
    assert by_excess.source == by_weight.source
