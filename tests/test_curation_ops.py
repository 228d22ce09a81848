"""Structural invariants for the round-5 curation / analytics operators —
properties the oracle hash can't state directly (coverage, monotonicity,
bounds), checked at sf0.001.
"""

from __future__ import annotations

import math

import pytest

from airbnb_listings_reviews_data_engineering_spark.checkpoint import release_pins
from airbnb_listings_reviews_data_engineering_spark.plans import all_queries

QS = all_queries()


@pytest.fixture(autouse=True)
def _free_pins(spark):
    yield
    release_pins(spark)


def rows(spark, sf_dir, key):
    return QS[key].fn(spark, sf_dir).collect()


def test_pack_length_pairs_covers_every_doc_once(spark, sf_dir):
    out = rows(spark, sf_dir, "pack_length_pairs")
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    seen = [r.long_doc for r in out] + [
        r.short_doc for r in out if r.short_doc is not None
    ]
    assert len(seen) == n, "every doc packs exactly once"
    assert len(set(seen)) == n
    assert len(out) == math.ceil(n / 2)
    middles = [r for r in out if r.short_doc is None]
    assert len(middles) == (n % 2), "odd corpus -> exactly one solo pack"


def test_kcenter_radius_monotone_and_centers_distinct(spark, sf_dir):
    out = sorted(rows(spark, sf_dir, "sample_kcenter_coreset"),
                 key=lambda r: r.center_rank)
    assert [r.center_rank for r in out] == list(range(1, len(out) + 1))
    assert len({r.vec_id for r in out}) == len(out)
    dists = [r.sel_dist for r in out[1:]]  # rank 1 is the seed (0.0)
    assert all(a >= b for a, b in zip(dists, dists[1:])), (
        "covering radius must be non-increasing"
    )
    assert all(d > 0 for d in dists)


def test_gopher_pass_equals_conjunction(spark, sf_dir):
    for r in rows(spark, sf_dir, "text_gopher_rules"):
        expect = (
            50 <= r.n_tok <= 100000
            and 3 <= r.mean_wlen <= 10
            and r.stop_hits >= 2
            and r.alpha_frac >= 0.8
            and r.uniq_ratio >= 0.2
        )
        assert r["pass"] == expect, r


def test_semdedup_accounts_every_vector_and_finds_plants(spark, sf_dir):
    out = rows(spark, sf_dir, "dedup_semdedup")
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    assert sum(r.n_vectors for r in out) == 2 * n, "base + perturbed all assigned"
    for r in out:
        assert r.n_dropped <= r.n_vectors
    # the +0.01 perturbation leaves cosine ~1: dups must exist somewhere
    assert sum(r.n_dup_pairs for r in out) > 0


def test_naive_bayes_covers_holdout_and_beats_chance(spark, sf_dir):
    out = rows(spark, sf_dir, "ml_naive_bayes")
    import duckdb

    n_test = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id % 5 = 0"
    ).fetchone()[0]
    assert len(out) == n_test
    assert all(r.score < 0 for r in out), "log-probabilities are negative"
    acc = sum(r.true_lang == r.pred_lang for r in out) / len(out)
    assert acc > 1 / 5, f"must beat 5-class chance, got {acc}"


def test_match_recognize_pattern_contract(spark, sf_dir):
    for r in rows(spark, sf_dir, "win_match_recognize"):
        assert r.down_len >= 2
        assert r.up_len >= 1
        assert r.bottom_price >= 0


def test_interpolation_bounded_by_neighbors(spark, sf_dir):
    out = rows(spark, sf_dir, "ts_interpolate_linear")
    kinds = {r.fill_kind for r in out}
    assert "obs" in kinds and "interp" in kinds, kinds
    # every filled value exists unless the entity had no observations
    for r in out:
        if r.fill_kind != "none":
            assert r.v_filled is not None


def test_bfs_distance_layers_are_connected(spark, sf_dir):
    out = rows(spark, sf_dir, "graph_bfs_shortest")
    by_dist = {}
    for r in out:
        by_dist.setdefault(r.dist, set()).add(r.node)
    assert by_dist.get(0) == {0}, "source is the only dist-0 node"
    assert len({r.node for r in out}) == len(out), "one distance per node"


def test_mixture_epochs_token_budget(spark, sf_dir):
    out = rows(spark, sf_dir, "sample_mixture_epochs")
    for r in out:
        assert r.factor > 0
        lo = math.floor(r.factor) * r.dom_tokens
        hi = math.ceil(r.factor) * r.dom_tokens
        assert lo <= r.emitted_tokens <= hi, r
        assert r.emitted_docs >= math.floor(r.factor) * r.n_docs


def test_rouge_scores_in_unit_interval(spark, sf_dir):
    out = rows(spark, sf_dir, "text_rouge_overlap")
    assert out, "pairs must exist"
    for r in out:
        assert 0 <= r.rouge2_precision <= 1
        assert 0 <= r.rouge2_recall <= 1
        assert r.rouge2_f1 <= max(r.rouge2_precision, r.rouge2_recall) + 1e-9
        if r.n_overlap == 0:
            assert r.rouge2_f1 == 0


def test_cuped_reduces_or_matches_welch_variance(spark, sf_dir):
    cuped = rows(spark, sf_dir, "ab_test_cuped")[0]
    assert cuped.n_a + cuped.n_b > 0
    assert cuped.t_cuped == cuped.t_cuped, "t must not be NaN"


def test_psi_terms_nonnegative(spark, sf_dir):
    out = rows(spark, sf_dir, "profile_drift_psi")
    for r in out:
        # (p2-p1)*ln(p2/p1) >= 0 always (same sign factors)
        assert r.psi_term >= 0, r
        assert r.n_ref + r.n_cur > 0


def test_jaccard_bounds_and_symmetric_pairs(spark, sf_dir):
    out = rows(spark, sf_dir, "graph_jaccard_neighbors")
    for r in out:
        assert r.a < r.b, "one orientation per pair"
        assert 0 < r.jaccard <= 1
        assert r.n_common >= 1


def test_merge_multi_clause_accounting(spark, sf_dir):
    out = rows(spark, sf_dir, "sink_merge_multi_clause")
    applied = {r.applied for r in out}
    assert "insert" in applied and "keep" in applied
    assert "close" not in applied, "deleted rows never surface"
    vip = [r for r in out if r.applied == "vip"]
    assert all(r.c_mktsegment == "VIP" for r in vip)


def test_wap_blocks_dirty_batch(spark, sf_dir):
    out = {r.batch: r for r in rows(spark, sf_dir, "sink_wap_publish")}
    assert out["batch1"].published is True
    assert out["batch2"].published is False
    assert out["batch2"].n_violations > 0
    assert out["final_state"].n_rows == out["batch1"].n_rows, (
        "published state must still be batch 1"
    )


def test_semdedup_multiprobe_dominates_single_probe(spark, sf_dir):
    single = rows(spark, sf_dir, "dedup_semdedup")
    multi = rows(spark, sf_dir, "dedup_semdedup_multiprobe")[0]
    assert multi.n_assignments == 2 * multi.n_vectors
    assert multi.n_dropped >= sum(r.n_dropped for r in single), (
        "probing 2 cells can only find MORE dup pairs"
    )


def test_decision_stump_gini_bounds(spark, sf_dir):
    out = rows(spark, sf_dir, "ml_decision_stump")
    feats = {r.feature for r in out}
    assert feats == {"price", "month"}
    for r in out:
        assert 0 <= r.wgini <= 0.5 + 1e-9, "binary weighted Gini is in [0, .5]"


def test_assortativity_is_a_correlation(spark, sf_dir):
    out = rows(spark, sf_dir, "graph_degree_assortativity")[0]
    assert out.n_directed_edges > 0
    assert -1 <= out.assortativity <= 1


def test_kanon_risk_fractions(spark, sf_dir):
    out = rows(spark, sf_dir, "text_kanon_risk")
    assert out
    for r in out:
        assert 0 <= r.rare_frac <= 1
        assert r.n_rare <= r.n_grams
        assert r.high_risk == (r.n_rare > 0.5 * r.n_grams)


def test_pass_at_k_bounds_and_saturation(spark, sf_dir):
    out = rows(spark, sf_dir, "eval_pass_at_k")
    assert out
    for r in out:
        assert 0 <= r.pass_at_1 <= 1
        assert 0 <= r.pass_at_5 <= 1
        assert r.pass_at_5 >= r.pass_at_1 - 1e-9, "pass@k grows with k"
        if r.n - r.c < 5:
            assert r.pass_at_5 == 1.0, "fewer failures than k -> certainty"


def test_fertility_at_least_one(spark, sf_dir):
    out = rows(spark, sf_dir, "text_tokenizer_fertility")
    assert out
    for r in out:
        assert r.fertility >= 1.0, "a word is at least one piece"
        assert r.n_subwords >= r.n_words


def test_dataset_card_consistency(spark, sf_dir):
    card = {r.metric: r.value for r in rows(spark, sf_dir, "profile_dataset_card")}
    assert card["n_docs"] > 0
    assert abs(card["mean_doc_tokens"] - round(card["n_tokens"] / card["n_docs"], 4)) < 1e-6
    assert 0 <= card["exact_dup_rate"] < 1
    import math
    assert 0 <= card["lang_entropy"] <= math.log(card["n_langs"]) + 1e-9


def test_reader_assignment_conserves_bytes(spark, sf_dir):
    out = rows(spark, sf_dir, "mm_reader_assignment")
    import duckdb

    total = duckdb.sql(
        f"SELECT sum(octet_length(encode(text))) FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r.total_bytes for r in out) == total, "no byte lost or doubled"
    assert sum(r.n_members for r in out) > 0


def test_attribution_conserves_windowed_revenue(spark, sf_dir):
    out = rows(spark, sf_dir, "win_attribution_linear")
    assert out
    for r in out:
        assert r.n_purchases >= 1
        assert r.attributed_revenue >= 0


def test_neyman_allocation_spends_the_budget(spark, sf_dir):
    out = rows(spark, sf_dir, "sample_neyman_allocation")
    assert len(out) == 5
    total = sum(r.alloc for r in out)
    # per-stratum independent rounding: within +/- strata/2 of budget
    assert abs(total - 1000) <= len(out), total
    for r in out:
        assert r.sigma_dollars > 0


def test_kcore_members_have_core_degree(spark, sf_dir):
    out = rows(spark, sf_dir, "graph_kcore_peel")
    # empty core is legal at tiny SF; when non-empty the invariant holds
    for r in out:
        assert r.core_degree >= 1


def test_dpp_matches_static_filter(spark, sf_dir):
    out = rows(spark, sf_dir, "join_dynamic_partition_pruning")
    prios = {r.o_orderpriority for r in out}
    assert all(p.startswith(("1-", "2-")) for p in prios)


def test_pq_accounts_all_vectors_in_each_subspace(spark, sf_dir):
    out = rows(spark, sf_dir, "sim_pq_quantize")
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    by_sub = {}
    for r in out:
        by_sub.setdefault(r.subspace, 0)
        by_sub[r.subspace] += r.n_vectors
        assert r.sum_d2_fp >= 0
    assert set(by_sub) == {0, 1, 2, 3}
    assert all(v == n for v in by_sub.values()), by_sub


def test_pmi_collocations_ranked(spark, sf_dir):
    out = rows(spark, sf_dir, "text_collocation_pmi")
    pmis = [r.pmi for r in out]
    assert pmis == sorted(pmis, reverse=True)
    assert all(r.n_pair >= 25 for r in out) or sf_dir.endswith("0.001")


def test_calibration_bins_partition_probability(spark, sf_dir):
    out = rows(spark, sf_dir, "ml_calibration_bins")
    for r in out:
        assert 0 <= r.mean_pred <= 1
        assert 0 <= r.empirical_rate <= 1
        assert abs(r.abs_gap - round(abs(r.mean_pred - r.empirical_rate), 4)) <= 2e-4


def test_gdpr_erasure_leaves_no_residual(spark, sf_dir):
    out = {r.phase: r for r in rows(spark, sf_dir, "sink_gdpr_erasure")}
    assert out["after"].n_residual == 0, "erasure must be total"
    assert out["before"].n_rows == out["after"].n_rows + out["erased"].n_rows
    assert out["erased"].n_users > 0


def test_seasonal_naive_wape_positive(spark, sf_dir):
    out = rows(spark, sf_dir, "ts_seasonal_naive_eval")
    for r in out:
        assert r.n_scored >= 1
        assert r.wape >= 0


def test_confusion_matrix_diagonal_dominates(spark, sf_dir):
    out = rows(spark, sf_dir, "ml_confusion_matrix")
    total = sum(r.n for r in out)
    diag = sum(r.n for r in out if r.true_lang == r.pred_lang)
    assert total > 0
    assert diag / total > 1 / 5, "accuracy consistency with the NB test"


def test_auc_in_unit_interval_and_consistent(spark, sf_dir):
    out = rows(spark, sf_dir, "ml_auc_exact")[0]
    assert 0 <= out.auc <= 1
    assert out.n_pos > 0 and out.n_neg > 0


def test_chat_template_token_accounting(spark, sf_dir):
    out = rows(spark, sf_dir, "text_chat_template")
    assert out
    for r in out:
        assert r.total_tokens_approx == r.prompt_tokens + r.response_tokens + 11
        assert len(r.chat_md5) == 32


def test_mmr_first_pick_is_pure_relevance(spark, sf_dir):
    out = rows(spark, sf_dir, "sim_mmr_rerank")
    if not out:  # sf0.001 has no query ids under the modulus
        return
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    for q_id, sels in by_q.items():
        sels.sort(key=lambda r: r.sel_rank)
        assert [s.sel_rank for s in sels] == list(range(1, len(sels) + 1))
        assert sels[0].rel == max(s.rel for s in sels), (
            "rank 1 must be the pure-relevance argmax"
        )
        assert len({s.vec_id for s in sels}) == len(sels)


def test_ndcg_bounds_and_perfect_when_all_relevant(spark, sf_dir):
    out = rows(spark, sf_dir, "ml_ndcg_at_k")
    for r in out:
        assert 0 <= r.precision_at_k <= 1
        assert 0 <= r.recall_at_k <= 1
        assert 0 <= r.ndcg_at_k <= 1
        if r.precision_at_k == 1.0:
            assert r.ndcg_at_k == 1.0, "all slots relevant -> ideal DCG"


def test_peak_concurrency_bounds(spark, sf_dir):
    out = rows(spark, sf_dir, "win_peak_concurrency")
    assert out
    for r in out:
        assert 1 <= r.peak_concurrency <= r.n_sessions


def test_scene_cut_frames_consistent(spark, sf_dir):
    out = rows(spark, sf_dir, "mm_scene_cuts")
    assert out
    for r in out:
        assert r.n_cuts <= r.n_frames - 1 or r.n_frames == 1
        if r.n_cuts == 0:
            assert r.first_cut_frame == -1
        else:
            assert 1 <= r.first_cut_frame < r.n_frames


def test_adamic_adar_positive_scores(spark, sf_dir):
    out = rows(spark, sf_dir, "graph_adamic_adar")
    for r in out:
        assert r.a < r.b
        assert r.n_common >= 3
        assert r.adamic_adar > 0


def test_watermark_null_calibration(spark, sf_dir):
    out = rows(spark, sf_dir, "text_watermark_zscore")
    assert out
    flagged = sum(r.flagged for r in out)
    # natural (hash-uncorrelated) text: essentially nothing clears z>4
    assert flagged / len(out) < 0.01, flagged
    for r in out:
        assert 0 <= r.green_frac <= 1


def test_cusum_changepoint_per_series(spark, sf_dir):
    out = rows(spark, sf_dir, "ts_changepoint_cusum")
    assert len(out) == len({r.series for r in out})
    for r in out:
        assert r.cusum_peak_scaled >= 0
        assert r.n_days >= 1


def test_copurchase_pairs_capped_and_floored(spark, sf_dir):
    out = rows(spark, sf_dir, "graph_copurchase_projection")
    for r in out:
        assert r.p1 < r.p2
        assert r.n_cobuyers >= 3


def test_bootstrap_envelope_contains_boot_mean(spark, sf_dir):
    out = rows(spark, sf_dir, "ab_bootstrap_ci")[0]
    assert out.boot_lo <= out.boot_mean <= out.boot_hi
    assert out.boot_se >= 0
    # Poisson bootstrap is unbiased: envelope should bracket the point
    assert out.boot_lo <= out.point_mean <= out.boot_hi


def test_join_cardinality_profile_sane(spark, sf_dir):
    out = {r.relationship: r for r in rows(spark, sf_dir, "profile_join_cardinality")}
    assert set(out) == {"customer->orders", "orders->lineitem"}
    for r in out.values():
        assert r.min_fanout >= 1
        assert r.min_fanout <= r.avg_fanout <= r.max_fanout


def test_date_dim_covers_whole_span(spark, sf_dir):
    out = rows(spark, sf_dir, "src_date_dim")
    import duckdb

    span = duckdb.sql(
        f"SELECT max(o_orderdate::DATE) - min(o_orderdate::DATE) + 1 "
        f"FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    assert sum(r.n_days for r in out) == span, "zero-activity days preserved"


def test_ytd_resets_at_year_boundary(spark, sf_dir):
    out = rows(spark, sf_dir, "win_ytd_running")
    firsts = {}
    for r in sorted(out, key=lambda r: (r.series, r.day)):
        yr = r.day[:4]
        k = (r.series, yr)
        if k not in firsts:
            firsts[k] = r
            assert r.ytd_rev == r.rev, "first day of each year restarts YTD"
        assert r.mtd_rev <= r.ytd_rev


def test_association_rules_scores(spark, sf_dir):
    out = rows(spark, sf_dir, "agg_association_rules")
    for r in out:
        assert 0 < r.support <= 1
        assert 0 < r.confidence <= 1
        assert r.lift > 0


def test_transition_matrix_rows_normalize(spark, sf_dir):
    out = rows(spark, sf_dir, "path_transition_matrix")
    by_from = {}
    for r in out:
        by_from.setdefault(r.from_state, 0.0)
        by_from[r.from_state] += r.p
    for state, total in by_from.items():
        assert abs(total - 1.0) < 0.01, (state, total)


def test_weighted_median_within_value_range(spark, sf_dir):
    out = rows(spark, sf_dir, "agg_weighted_median")
    import duckdb

    for r in out:
        lo, hi = duckdb.sql(
            f"SELECT min(l_extendedprice), max(l_extendedprice) FROM "
            f"read_parquet('{sf_dir}/lineitem.parquet') "
            f"WHERE l_returnflag = '{r.l_returnflag}'"
        ).fetchone()
        assert lo <= r.weighted_median <= hi


def test_survival_monotone_nonincreasing(spark, sf_dir):
    out = sorted(rows(spark, sf_dir, "ts_survival_km"), key=lambda r: r.day)
    prev = 1.0
    for r in out:
        assert 0 <= r.survival <= prev + 1e-9, (r.day, r.survival, prev)
        prev = r.survival
        assert r.n_churned < r.n_at_risk


def test_rolling_corr_bounds(spark, sf_dir):
    out = rows(spark, sf_dir, "win_rolling_corr")
    for r in out:
        assert -1 - 1e-9 <= r.rolling_corr <= 1 + 1e-9
        assert r.n == 30


def test_rake_phrases_multiword(spark, sf_dir):
    out = rows(spark, sf_dir, "text_keyphrase_rake")
    scores = [r.rake_score for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        assert 2 <= len(r.phrase.split(" ")) <= 5
        assert r.rake_score > 0


def test_markov_attribution_base_dominates(spark, sf_dir):
    out = {r.variant: r for r in rows(spark, sf_dir, "path_markov_attribution")}
    assert out["base"].removal_effect == 0.0
    for variant, r in out.items():
        assert 0 <= r.conv_prob <= 1
        if variant != "base":
            assert r.conv_prob <= out["base"].conv_prob + 1e-9, (
                "removing a channel can only reduce conversion"
            )
            assert 0 <= r.removal_effect <= 1


def test_acf_lag_zero_normalization(spark, sf_dir):
    out = rows(spark, sf_dir, "ts_autocorrelation")
    assert len(out) == 14
    for r in out:
        assert -1.05 <= r.acf <= 1.05, r
        assert r.n_pairs >= 1


def test_new_plus_returning_equals_active(spark, sf_dir):
    out = rows(spark, sf_dir, "agg_new_vs_returning")
    total_new = 0
    for r in out:
        assert r.n_new + r.n_returning == r.n_active
        total_new += r.n_new
    import duckdb

    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    assert total_new == n_users, "every user is new exactly once"


def test_streaks_positive(spark, sf_dir):
    out = rows(spark, sf_dir, "win_activity_streaks")
    assert out
    for r in out:
        assert r.longest_streak >= 1


def test_rfm_partitions_customers(spark, sf_dir):
    out = rows(spark, sf_dir, "agg_rfm_segmentation")
    import duckdb

    n = duckdb.sql(
        f"SELECT count(DISTINCT o_custkey) FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    assert sum(r.n_customers for r in out) == n
    assert len(out) <= 8


def test_price_volume_bridge_reconciles(spark, sf_dir):
    out = rows(spark, sf_dir, "agg_price_volume_mix")
    for r in out:
        assert abs(r.delta_revenue - (r.volume_effect + r.price_effect)) < 0.05, r


def test_pareto_point_sane(spark, sf_dir):
    out = rows(spark, sf_dir, "agg_pareto_coverage")[0]
    assert 1 <= out.n_top <= out.n_customers
    assert 0 < out.customer_share <= 1
    # 80% of revenue should need fewer than ~80% of customers on any
    # non-uniform revenue distribution
    assert out.customer_share < 0.95


def test_winnowing_density_near_theory(spark, sf_dir):
    out = rows(spark, sf_dir, "text_winnowing_fingerprints")
    assert out
    import statistics

    dens = [r.n_fingerprints / r.n_kgrams for r in out if r.n_kgrams > 50]
    if dens:
        # expected density 2/(w+1) = 0.4 for w=4 (distinct-hash dedup
        # within a doc pulls it slightly below); must be a real sample,
        # far from keep-everything and from degenerate
        assert 0.1 < statistics.mean(dens) < 0.6, statistics.mean(dens)
    for r in out:
        assert 1 <= r.n_fingerprints <= r.n_kgrams


def test_classifier_agreement_accounts_holdout(spark, sf_dir):
    out = rows(spark, sf_dir, "ml_classifier_agreement")
    import duckdb

    n_test = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id % 5 = 0"
    ).fetchone()[0]
    assert sum(r.n for r in out) == n_test
    for r in out:
        assert 0 <= r.n_nb_correct <= r.n
