"""Invariant tests for the round-6 continuation-5 queries — cheap
mathematical sanity properties on top of the oracle value-hash parity
(which test_oracle_parity already runs for every one of these)."""

from __future__ import annotations

import math

from healthcare_etl_spark.plans.registry import get_registry


def _rows(spark, sf, name):
    return get_registry()[name].fn(spark, sf).collect()


def test_fd_discovery_invariants(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_fd_discovery")
    byname = {(r.table_name, r.determinant, r.dependent): r for r in rows}
    for r in rows:
        assert 0 <= r.n_violating_keys <= r.n_keys
        assert r.fd_holds == (r.n_violating_keys == 0)
    # event_id is the events PK: the FD to any column must hold exactly
    assert byname[("events", "event_id", "user_id")].fd_holds
    assert byname[("orders", "o_orderkey", "o_custkey")].fd_holds


def test_fk_discovery_invariants(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_fk_discovery")
    byname = {(r.child_table, r.child_col): r for r in rows}
    for r in rows:
        assert 0 <= r.n_contained <= r.n_child_keys
        assert 0.0 <= r.containment <= 1.0
        assert r.fk_candidate == (r.n_contained == r.n_child_keys)
    # the TPC-H referential skeleton must be discovered
    assert byname[("lineitem", "l_orderkey")].fk_candidate
    assert byname[("orders", "o_custkey")].fk_candidate


def test_shuffle_skew_planner_invariants(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_shuffle_skew_planner")
    assert {r.strategy for r in rows} == {"unsalted", "salted8"}
    for r in rows:
        assert r.parts_used <= 32
        assert r.max_load >= r.mean_load * (r.parts_used / 32.0) / 32.0
        assert r.skew_ratio > 0


def test_sortedness_audit_bounds(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_sortedness_audit"):
        assert 0.0 <= r.sortedness <= 1.0
        assert r.n_pairs == r.n_rows - 1


def test_vif_at_least_one(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_vif"):
        assert r.vif >= 1.0 - 1e-9
        assert 0.0 <= r.r2_on_others <= 1.0


def test_jarque_bera_nonnegative(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_jarque_bera"):
        assert r.jb_stat >= 0.0
        assert r.n > 0


def test_holm_monotone_and_dominates_raw(spark, sf_smoke):
    rows = sorted(_rows(spark, sf_smoke, "q_holm_correction"), key=lambda r: r.rnk)
    prev = 0.0
    for r in rows:
        assert r.p_holm >= r.p - 1e-9  # adjusted never below raw
        assert r.p_holm >= prev - 1e-9  # step-down is monotone in rank
        prev = r.p_holm
        if r.rejected:
            assert r.p_holm <= 0.05 + 1e-9


def test_periodogram_shares_sum_to_one(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_periodogram")
    assert len(rows) == 9
    assert math.isclose(sum(r.power_share for r in rows), 1.0, abs_tol=1e-4)
    for r in rows:
        assert r.power >= 0.0


def test_binary_segmentation_invariants(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "q_binary_segmentation")
    assert r.n_left >= 5 and r.n_right >= 5
    assert 0.0 <= r.sse_drop_ratio <= 1.0


def test_croston_invariants(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "q_croston")
    assert r.n_demand_days >= 1
    if r.smoothed_interval is not None:
        assert r.smoothed_interval >= 1.0
        assert r.forecast_per_day > 0.0


def test_fixed_effects_r2_bounds(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "q_fixed_effects_panel")
    assert 0.0 <= r.within_r2 <= 1.0
    assert r.n_entities <= 64


def test_event_study_baseline_is_zero(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_event_study")
    base = [r for r in rows if r.rel_week == -1]
    assert len(base) == 1
    assert base[0].effect_cents == 0.0


def test_err_eval_bounds(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_err_eval")
    assert len(rows) == 10
    for r in rows:
        assert 0.0 <= r.err <= 1.0
        assert 0 <= r.n_hits <= 10


def test_rouge_overlap_bounds(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_rouge_overlap"):
        assert 0.0 <= r.rouge1_recall <= 1.0
        assert 0.0 <= r.rouge2_recall <= 1.0
        assert r.ref_id > r.cand_id


def test_harmonic_centrality_bounds(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_harmonic_centrality"):
        # every term 1/d <= 1, so harmonic <= n_reached; every node in a
        # pair graph has >= 1 neighbor at distance 1
        assert r.n_reached >= 1
        assert r.harmonic <= r.n_reached + 1e-9
        assert r.harmonic > 0.0


def test_semantic_decontaminate_partition(spark, sf_smoke):
    from pyspark.sql import functions as F

    from healthcare_etl_spark.sources import load_table

    rows = _rows(spark, sf_smoke, "q_semantic_decontaminate")
    emb = load_table(spark, sf_smoke, "embeddings")
    total = emb.count()
    held = emb.filter((F.col("vec_id") % 101) < 5).count()
    assert len(rows) == total - held


def test_smote_rows_cover_minority(spark, sf_smoke):
    from pyspark.sql import functions as F

    from healthcare_etl_spark.sources import load_table

    rows = _rows(spark, sf_smoke, "q_smote_synthesis")
    emb = load_table(spark, sf_smoke, "embeddings")
    counts = (
        emb.groupBy("label").agg(F.count(F.lit(1)).alias("n")).orderBy("n", "label")
    ).collect()
    minority_n = counts[0].n
    assert len(rows) == minority_n
    for r in rows:
        assert r.neighbor_id != r.base_id
        assert r.synth_norm >= 0.0


def test_weibull_fit_invariants(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "q_weibull_fit")
    assert r.n_points >= 2
    assert r.shape_k > 0.0
    assert r.scale_hours > 0.0
    assert 0.0 <= r.r2 <= 1.0


def test_gamma_interarrival_invariants(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_gamma_interarrival"):
        assert r.shape_k > 0.0
        assert r.scale_theta_s > 0.0
        # MoM identity: k * theta == mean (up to rounding)
        assert abs(r.shape_k * r.scale_theta_s - r.mean_gap_s) < max(
            1.0, r.mean_gap_s * 1e-3
        )


def test_partition_advisor_invariants(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_partition_count_advisor")
    assert {r.table_name for r in rows} == {
        "lineitem", "orders", "events", "documents", "embeddings",
    }
    for r in rows:
        assert r.shuffle_partitions_128mb >= 1
        assert r.files_1gb <= r.shuffle_partitions_128mb
        assert r.rows_per_partition <= r.n_rows


def test_stratified_kfold_balance(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_stratified_kfold")
    per_label = {}
    for r in rows:
        per_label.setdefault(r.label, []).append(r.n_vecs)
    for label, counts in per_label.items():
        assert max(counts) - min(counts) <= 1, f"label {label}: {counts}"


def test_table_health_report_sections(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_table_health_report")
    sections = {r.section for r in rows}
    assert sections == {"fd", "fk", "layout", "size"}


def test_huber_location_invariants(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "q_huber_location")
    assert r.tuning_c > 0.0
    assert 0.0 <= r.frac_downweighted <= 1.0
    assert r.huber_location > 0.0


def test_ql_dirichlet_invariants(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_ql_dirichlet_search")
    assert len(rows) == 20
    for r in rows:
        assert r.score < 0.0  # log-probabilities


def test_paired_ttest_invariants(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "q_paired_ttest")
    assert r.n_users > 1
    assert r.sd_diff > 0.0


def test_icc_bounds(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "q_icc_oneway")
    assert -1.0 <= r.icc1 <= 1.0
    assert r.ms_within > 0.0


def test_column_entropy_bounds(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_column_entropy_profile"):
        assert r.entropy_nats >= 0.0
        assert 0.0 <= r.normalized_entropy <= 1.0 + 1e-9


def test_freshness_and_nulls(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_data_freshness_audit"):
        assert r.hours_stale >= 0
    for r in _rows(spark, sf_smoke, "q_null_rate_profile"):
        assert 0.0 <= r.null_rate <= 1.0
        assert r.complete == (r.n_null == 0)


def _plan(spark, sf, name):
    df = get_registry()[name].fn(spark, sf)
    return df._jdf.queryExecution().executedPlan().toString()


def test_semantic_decontaminate_broadcasts_heldout(spark, sf_smoke):
    """The held-out side of each cluster is eval-set-sized: it must come
    in as a broadcast join, never a shuffle join, and the pair
    generation must be the cluster-keyed equi-join (no cartesian)."""
    plan = _plan(spark, sf_smoke, "q_semantic_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_smote_minority_join_is_broadcast(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "q_smote_synthesis")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_periodogram_factor_join_is_broadcast(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "q_periodogram")
    assert "BroadcastHashJoin" in plan


def test_top_movers_uses_rank_limit(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "q_top_movers")
    assert "TakeOrderedAndProject" in plan


def test_trailing_hour_sum_invariants(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_trailing_hour_sum")
    assert len(rows) > 0
    for r in rows[:200]:
        assert r.n_in_hour >= 1  # frame includes the current row
        assert r.trailing_hour_cents >= 0


def test_grouped_mad_scaling(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_grouped_mad"):
        assert abs(r.robust_sigma - 1.4826 * r.mad_value) < 1e-3
        assert r.mad_value >= 0.0


def test_pointbiserial_bounds(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_pointbiserial_screen")
    assert len(rows) == 3
    for r in rows:
        assert -1.0 <= r.point_biserial_r <= 1.0


def test_label_noise_screen_nonempty(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_label_noise_screen")
    assert len(rows) > 0
    for r in rows:
        assert r.lang_pred != r.label
        assert r.n_docs >= 1


def test_top_movers_sorted_by_abs_delta(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_top_movers")
    assert len(rows) == 10
    deltas = [abs(r.delta_cents) for r in rows]
    assert deltas == sorted(deltas, reverse=True)


def test_user_segments_cover_all_users(spark, sf_smoke):
    from healthcare_etl_spark.sources import load_table

    rows = _rows(spark, sf_smoke, "q_user_segments_kmeans")
    assert 1 <= len(rows) <= 3
    n_users = load_table(spark, sf_smoke, "events").select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users


def test_auc_delong_invariants(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "q_auc_delong_ci")
    assert 0.0 <= r.auc <= 1.0
    assert r.se_delong > 0.0
    assert r.ci_lo <= r.auc <= r.ci_hi


def test_newsvendor_invariants(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_newsvendor_stock"):
        assert r.n_days <= 31
        assert r.stock_level_p80 > 0.0


def test_bayes_ab_invariants(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "q_bayes_ab_prob")
    assert 0.0 <= r.prob_b_beats_a <= 1.0
    assert 0.0 < r.post_mean_a < 1.0 and 0.0 < r.post_mean_b < 1.0


def test_chimerge_partition(spark, sf_smoke):
    from healthcare_etl_spark.sources import load_table

    rows = sorted(_rows(spark, sf_smoke, "q_chimerge_binning"), key=lambda r: r.bin)
    n_users = load_table(spark, sf_smoke, "events").select("user_id").distinct().count()
    # ntile yields min(16, n_users) non-empty initial bins; 8 merges follow
    assert len(rows) == max(1, min(16, n_users) - 8)
    assert sum(r.n_users for r in rows) == n_users
    for a, b in zip(rows, rows[1:]):
        assert a.hi_x <= b.lo_x  # bins stay ordered, non-overlapping ranges


def test_weighted_median_in_range(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_weighted_median"):
        assert r.weighted_median_price > 0.0
        assert r.total_qty > 0


def test_decayed_popularity_shares(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_decayed_popularity")
    assert abs(sum(r.decayed_share for r in rows) - 1.0) < 1e-4
    ranks = sorted(r.trend_rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_temporal_split_partition(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "q_temporal_split_audit")
    assert r.train_only + r.eval_only_cold_start + r.in_both == r.n_users
    assert 0.0 <= r.eval_user_overlap_rate <= 1.0


def test_term_burstiness_bounds(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_term_burstiness"):
        assert r.burstiness_vmr >= 0.0
        assert r.df >= 10


def test_duplicate_charge_pairs_valid(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_duplicate_charge_screen"):
        assert r.first_id < r.second_id
        assert 0 <= r.gap_minutes <= 24 * 60
