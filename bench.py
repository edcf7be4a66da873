#!/usr/bin/env python
"""Benchmark runner: executes the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of all benched queries (one warm-up
query first to absorb JVM/AQE startup, excluded from timings).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline queries: the flagship + one per operator family.
BENCH_QUERIES = [
    "evt_metrics_r2_mse",
    "rel_pricing_summary",
    "rel_revenue_by_nation",
    "rel_topk_orders_per_segment",
    "evt_upsert_dedup",
    "evt_ffill_bfill",
    "evt_sequence_build",
    "evt_sessionize",
    "doc_minhash_lsh_candidates",
    "doc_jaccard_near_dup",
    "doc_dedup_clusters",
    "doc_simhash",
    "emb_cosine_topk",
    "emb_bucketed_ann_topk",
    "emb_ivf_topk",
    "evt_routed_inference",
    "evt_series_trend",
    "evt_asof_join",
    "evt_salted_heavy_hitters",
    "rel_rollup_revenue",
    "stream_windowed_counts",
    "stream_series_state",
    "mm_media_meta",
    "mm_frame_sample",
    "rel_small_qty_revenue",
    "rel_cust_order_histogram",
    "rel_large_orders",
    "rel_nation_trade_volume",
    "rel_profit_by_nation_year",
    "rel_late_sole_supplier",
    "doc_corpus_filter",
    "emb_label_centroids",
    "evt_series_similarity_topk",
    "doc_tfidf_top_terms",
    "emb_kmeans_assign",
    "evt_rolling_window_stats",
    "stream_view_purchase_join",
    "doc_levenshtein_verify",
    "rel_market_share",
    "evt_funnel",
    "evt_hash_sample",
    "doc_dedup_pipeline",
    "rel_scd2_priority_dim",
    "evt_incremental_monthly_agg",
    "doc_decontaminate",
    "doc_chunk_windows",
    "doc_repetition_filter",
    "doc_mix_sample",
    "doc_train_shuffle",
    "stream_corpus_filter",
    "evt_anomaly_zscore",
    "rel_cohort_retention",
    "doc_unk_mask",
    "emb_dedup_clusters",
    "evt_gap_fill",
    "evt_series_dtw",
    "evt_spearman_view_purchase",
    "stream_static_enrich",
    "evt_data_quality_audit",
    "evt_tree_scoring_sql",
    "doc_pmi_collocations",
    "sql_monthly_priority_share",
    "rel_min_cost_supplier",
    "rel_part_value_share",
    "rel_supplier_census",
    "rel_dominant_suppliers",
    "rel_priority_with_returns",
    "doc_dup_ngram_fraction",
    "doc_unigram_logprob",
    "doc_bm25_search",
    "evt_winsorize",
    "evt_histogram",
    "emb_kfold_assign",
    "stream_dedup_ttl_counts",
    "stream_converted_views",
    "evt_ohlc_bars",
    "evt_ewma",
    "rel_rfm_scores",
    "doc_containment",
    "doc_top_terms_fast",
    "doc_token_entropy",
    "stream_sliding_counts",
    "evt_series_mad_fast",
    "evt_upsert_merge_partitioned",
    "doc_importance_sample",
    "evt_psi_drift",
    "rel_mom_revenue_growth",
    "sql_grouping_sets_revenue",
    "emb_random_negatives",
    "emb_hard_negatives",
    "emb_ivfpq_residual_topk",
    "evt_cusum_alarms",
    "stream_incremental_rollup",
    "mm_audio_chunks",
    "rel_spend_percentiles",
    "doc_pii_scrub",
    "doc_pack_sequences",
    "emb_semantic_dedup",
    "doc_minhash_lsh_selective",
    "doc_stratified_split",
    "doc_pagerank_authority",
    "doc_bigram_lm_score",
    "rel_forecast_revenue",
    "doc_chunk_dedup",
    "doc_corpus_overlap",
    "emb_sq_topk",
    "stream_unmatched_views",
    "doc_length_batching",
    "doc_incremental_dedup",
    "evt_holt_smoothing",
    "evt_seasonal_profile",
    "evt_markov_transitions",
    "evt_chisq_independence",
    "evt_quantile_normalize",
    "evt_welch_ttest",
    "evt_benford_audit",
    "evt_autocorrelation",
    "doc_vocab_coverage",
    "mm_payload_dedup",
    "evt_calendar_features",
    "evt_ks_drift",
    "evt_ols_features",
    "doc_repeated_spans",
    "doc_bpe_train_merges",
    "evt_rank_auc",
    "evt_attribution",
    "doc_rake_keywords",
    "rel_referential_audit",
    "evt_walk_forward_mae",
    "emb_mmr_rerank",
    "evt_cms_heavy_hitters",
    "evt_theilsen_trend",
    "stream_heavy_hitters",
    "evt_hll_rollup_distinct",
    "emb_centroid_drift",
    "evt_calibration_bins",
    "doc_temperature_mix",
    "emb_random_projection",
    "evt_poisson_bootstrap_ci",
    "mm_phash_near_dup",
    "doc_dedup_spans_removal",
    "doc_dupgraph_triangles",
    "evt_km_retention",
    "evt_max_concurrency",
    "emb_pca_project",
    "evt_ccf_lead_lag",
    "emb_knn_eval",
    "evt_markov_entropy",
    "evt_topk_paths",
    "evt_windowed_funnel",
    "evt_audience_overlap",
    "evt_markov_attribution",
    "evt_activity_islands",
    "doc_phrase_search",
    "emb_knn_communities",
    "mm_scene_cuts",
    "evt_hll_audience_overlap",
    "evt_asof_nearest",
    "evt_weighted_sample",
    "evt_stl_decompose",
    "evt_rolling_distinct",
    "rel_scd2_point_in_time",
    "evt_eb_shrunk_rates",
    "doc_zipf_fit",
    "doc_term_burstiness",
    "evt_time_to_convert",
    "evt_stl_anomaly",
    "evt_basket_lift",
    "evt_new_returning",
    "evt_approx_percentiles",
    "evt_pit_training_matrix",
    "evt_did_estimate",
    "stream_hll_distinct",
    "doc_source_log_odds",
    "doc_novelty_fraction",
    "evt_seasonality_strength",
    "rel_segment_migration",
    "evt_type_diversity",
    "doc_source_js_divergence",
    "evt_growth_accounting",
    "rel_backlog_aging",
    "rel_supplier_hhi",
    "rel_discount_elasticity",
    "emb_fisher_ratio",
    "evt_proportion_ztest",
    "evt_gini_value",
    "evt_peak_detection",
    "doc_kn_bigram_lm",
    "emb_silhouette",
    "doc_minhash_estimate_error",
    "rel_weighted_median_price",
    "doc_ppl_buckets",
    "doc_cluster_size_histogram",
    "evt_group_sample",
    "evt_time_range_rolling",
    "mm_storage_report",
    "evt_linear_interpolate",
    "evt_outlier_iqr",
    "sql_lateral_topk",
    "src_pydatasource_agg",
    "stream_pydatasource_counts",
    "evt_partition_skew_report",
    "rel_join_cardinality_audit",
    "doc_lsh_tuning_curve",
    "evt_geo_hotspot_grid",
    "evt_geo_radius_join",
    "doc_substring_search_trgm",
    "evt_ltv_discounted",
    "emb_davies_bouldin",
    "emb_ivfpq_residual_check",
    "evt_drawdown",
    "evt_bollinger_bands",
    "evt_rsi",
    "evt_event_study_car",
    "doc_dsir_importance",
    "emb_matryoshka_recall",
    "emb_rrf_fusion",
    "emb_lloyd_step_check",
    "evt_cusum_check",
    "emb_mmr_check",
    "evt_hll_portable_rollup",
    "evt_markov_absorption_check",
    "evt_dtw_check",
    "doc_feature_hashing",
    "doc_wordpiece_segment",
    "evt_cuped_adjustment",
    "doc_suffix_ranks",
    "doc_dupgraph_bfs",
    "evt_isotonic_calibration",
    "evt_zorder_layout",
    "evt_lttb_downsample",
    "evt_holt_winters_check",
    "evt_compaction_plan",
    "doc_cdc_chunks",
    "evt_ab_assignment",
    "evt_cms_portable_check",
    "emb_mahalanobis_ood",
    "evt_activity_bitmaps",
    "evt_behavior_cohorts",
    "evt_props_variant",
    "emb_ivf_nprobe_curve",
    "doc_textrank_keywords",
    "rel_copurchase_topk",
    "evt_rootcause_contributions",
    "emb_dbscan_core_points",
    "evt_slo_burn_rate",
    "evt_alert_rules",
    "evt_cohort_ltv_curve",
    "evt_mtbf_mttr",
    "doc_dataset_card",
    "emb_ivf_incremental_assign",
    "evt_ordering_audit",
    "evt_watermark_curve",
    "doc_filter_waterfall",
    "emb_mmd_drift",
    "evt_sequential_boundary",
    "evt_bandit_replay",
    "evt_next_event_prediction",
    "evt_correlation_matrix",
    "emb_health_check",
    "evt_histogram_quantile_check",
    "evt_k_anonymity_audit",
    "evt_dp_contribution_bounds",
    "rel_join_size_estimator",
    "emb_shard_plan",
    "doc_lsh_cost_estimator",
    "evt_decision_stump",
    "evt_data_contract_checks",
    "evt_user_skyline",
    "evt_twap",
    "doc_winnowing_fingerprints",
    "evt_state_machine_audit",
    "rel_entity_resolution",
    "rel_seat_apportionment",
    "evt_changepoint_sse",
    "evt_interval_coverage",
    "rel_price_band_join",
    "evt_mann_kendall",
    "evt_runs_test",
    "evt_permutation_test",
    "rel_inventory_fill",
    "evt_queue_wait_lindley",
    "evt_logrank_table",
    "rel_waterfill_allocation",
    "evt_anova_oneway",
    "evt_cronbach_alpha",
    "evt_kruskal_wallis",
    "evt_friedman_test",
    "doc_readability_scores",
    "evt_tukey_pairs",
    "evt_wilcoxon_signed_rank",
    "evt_mcnemar_test",
    "evt_cohens_kappa",
    "evt_standardized_rates",
    "evt_gains_table",
    "rel_abc_xyz",
    "evt_cmh_test",
    "evt_p_chart",
    "evt_capture_recapture",
    "evt_jackknife_ratio",
    "evt_odds_ratio_mh",
    "evt_extreme_value_gumbel",
    "evt_mood_median_test",
    "rel_newsvendor_stock",
    "evt_pot_gpd_tail",
    "evt_sax_words",
    "evt_var_cvar",
    "evt_granger_lite",
    "mm_resolution_buckets",
    "mm_modality_mix_plan",
    "stream_interval_union",
    "evt_shapley_attribution",
    "evt_ljung_box",
    "evt_fdr_bh",
    "evt_kendall_tau_matrix",
    "rel_price_index",
    "evt_morans_i",
    "evt_gof_weekday",
    "evt_geary_c",
    "evt_local_morans",
    "evt_knox_test",
    "emb_lloyd_round2_check",
    "emb_pca_basis_check",
    "emb_logreg_margin_check",
    "doc_bloom_portable_check",
    "evt_mann_whitney_u",
    "evt_levene_median",
    "evt_durbin_watson",
    "evt_grubbs_outlier",
    "evt_cochran_q",
    "doc_hapax_ratio",
    "doc_heaps_law",
    "doc_simpson_diversity",
    "doc_ttr_chunks",
    "rel_knapsack_greedy",
    "rel_wilson_ranking",
    "evt_dau_mau",
    "rel_inventory_policy",
    "stream_session_values",
    "emb_sq_error_profile",
    "evt_cusum_squares",
    "evt_rescaled_range",
    "doc_boilerplate_prefixes",
    "doc_dupgraph_kcore",
    "evt_srm_check",
    "evt_power_analysis",
    "evt_frequency_cap_sim",
    "evt_conversion_window_sweep",
    "sql_pivot_monthly_status",
    "evt_records_test",
    "evt_fano_factor",
    "rel_bullwhip_ratio",
    "rel_otif_fill",
    "evt_interarrival_cv",
    "doc_priority_sample",
    "doc_dupgraph_assortativity",
    "rel_repurchase_intervals",
    "doc_simhash_distance_profile",
    "evt_haar_energy",
    "doc_token_shape_profile",
    "evt_weekday_weekend_lift",
    "doc_bpe_train3_check",
    "mm_phash_portable_check",
    "emb_pq_adc_check",
    "emb_knn_label_prop_check",
    "evt_sketch_portable_profile",
    "evt_hll_portable_overlap",
    "doc_wordpiece_fertility",
    "doc_ngram_coverage_curve",
    "doc_vocab_pruning_oov",
    "evt_brier_decomposition",
    "evt_ipf_raking_check",
    "evt_rate_limit_audit",
    "evt_rate_limit_policy_sweep",
    "stream_rate_limited",
    "evt_wasserstein_1d",
    "emb_binary_quantization_topk",
    "evt_pacf_yw",
    "stream_hll_portable_distinct",
    "doc_dupgraph_modularity",
    "evt_cointegration_lite",
    "doc_span_corruption",
    "evt_qini_uplift",
    "evt_changepoint_binseg2",
    "emb_semihard_triplets",
    "evt_mase_backtest",
    # round 9
    "evt_theil_inequality",
    "evt_atkinson_stats",
    "rel_herfindahl_market",
    "doc_char_bigram_entropy",
    "doc_blocklist_filter",
    "evt_page_hinkley",
    "evt_peaks_over_threshold",
    "stream_page_hinkley",
    "evt_weibull_plot_fit",
    "emb_anisotropy_spectrum",
    "emb_cluster_label_purity",
    "evt_mutual_information",
    "evt_confusion_threshold",
    "evt_simpson_paradox_audit",
    "evt_ldp_frequency",
    "evt_session_gap_sweep",
    "emb_distance_histogram",
    "rel_intermittency_profile",
    "rel_croston_intermittent",
    "evt_tail_dependence",
    "evt_information_value",
    "evt_moment_skew_kurtosis",
    "evt_hill_tail_index",
    "evt_turning_points",
    "evt_permutation_entropy",
    "evt_burst_hysteresis",
    "evt_chow_test",
    "evt_kpss_partial_sums",
    "evt_adstock_carryover",
    "rel_soundex_blocking",
    "emb_hnsw_level_plan",
    "stream_cms_portable_grid",
    "emb_kcenter_coreset",
    "rel_fifo_cogs",
    "evt_energy_distance",
    "evt_xbar_r_chart",
    "evt_higuchi_fd",
    "evt_seasonal_mann_kendall",
    "evt_transfer_entropy",
    "stream_histogram_quantiles",
    "emb_alignment_uniformity",
    "evt_kupiec_var_backtest",
    "evt_downside_risk",
    "rel_auction_clearing",
    "evt_empirical_copula",
    "doc_watermark_greenlist",
    "evt_lof_reachability",
    "emb_twonn_intrinsic_dim",
    "doc_rbo_term_ranks",
    "evt_hampel_filter",
    "rel_duplicate_payments",
    "evt_nelson_rules",
    "evt_jonckheere_terpstra",
    "evt_rayleigh_hours",
    "evt_lorenz_asymmetry",
    "evt_robust_shape_quantiles",
    "rel_mrp_projection",
    "evt_walsh_hadamard_energy",
    "evt_pettitt_test",
    "evt_partial_correlation",
    "evt_sprt_conversion",
    "evt_benford_two_digit",
    "evt_pairwise_wins_bt",
    "doc_shard_token_balance",
    "doc_greedy_vocab_cover",
    "evt_dominant_period",
    "evt_decile_shift_function",
    "evt_time_to_threshold",
    "doc_word_bigram_entropy",
    "rel_price_dispersion",
    "evt_variance_ratio_test",
    "evt_pinball_loss",
    "evt_diebold_mariano",
    "doc_gopher_rules",
    "emb_hubness",
    "rel_nation_portfolio_overlap",
    "evt_sample_entropy",
    "stream_interval_union_tws",
    "stream_series_state_tws",
    "evt_conformal_prediction",
    "evt_bgnbd_summary",
    "evt_l_moments",
    "emb_trustworthiness",
    "doc_ndcg_at_k",
    "evt_hoover_index",
    "evt_purged_cv_folds",
    "rel_leadtime_reliability",
    "evt_digit_heaping",
    "rel_assortment_churn",
    "emb_reciprocal_nn",
    "emb_knn_margin",
    "evt_tv_drift",
    "doc_dup_cluster_sources",
    # round 11
    "evt_cramer_von_mises",
    "evt_cucconi_test",
    "evt_hoeffding_d",
    "rel_goodman_kruskal_gamma",
    "evt_somers_d",
    "evt_l_diversity",
    "evt_mondrian_cuts",
    "evt_smote_bucketed",
    "stream_session_close_tws",
    "evt_lepage_components",
    "evt_seq_pattern_support",
    "stream_pysink_roundtrip",
    "rel_ruzicka_similarity",
    "evt_kendall_w",
    "doc_contrastive_triplets",
    "evt_hmm_viterbi_check",
    "evt_recurrence_quantification",
    "rel_eoq_components",
    # round 12
    "evt_kuiper_test",
    "evt_benjamini_yekutieli",
    "evt_gk_lambda",
    "doc_burrows_delta",
    "doc_lcs_rouge",
    "emb_hopkins_statistic",
    "evt_sharpe_sortino",
    "evt_omega_ratio",
    "evt_page_trend",
    "evt_hjorth_parameters",
    "evt_christoffersen_test",
    "evt_first_passage_time",
    "evt_bowker_symmetry",
    "evt_longest_streaks",
    "evt_extremal_index",
    "evt_teager_energy",
    "evt_ulcer_index",
    "evt_aroon",
    "evt_variogram_lags",
    "evt_theil_u2_naive",
]


#: Calibration workload: pure-CPU whole-stage-codegen over a range —
#: data-independent, shuffle-free, multicore like the bench itself, so
#: its slowdown under host load mirrors the queries' slowdown.
CALIB_ROWS = 2_000_000_000
#: Quiet-host reference for the calibration workload (median of 8 runs,
#: load avg 1.1/32 cores, 2026-08-15, round 8). host_factor =
#: measured_median / this; value_normalized divides the headline total
#: by host_factor so a loaded-host artifact self-corrects instead of
#: manufacturing phantom regressions (r6/r7 driver artifacts both did).
CALIB_REF_SEC = 0.62


def _calibrate(spark, n: int = 3) -> list[float]:
    runs = []
    for _ in range(n):
        t0 = time.time()
        spark.range(CALIB_ROWS).selectExpr(
            "sum(xxhash64(id) % 1000000) AS s"
        ).collect()
        runs.append(round(time.time() - t0, 3))
    return runs


#: Outlier-retry rule (round-10 verdict task 3): any query whose fresh
#: min-of-N exceeds RETRY_FACTOR x its last committed quiet-host time
#: (BENCH_QUIET_REF.json — per-query minimum across every committed
#: BENCH_RESULTS.json) gets ONE immediate re-run block appended to the
#: same artifact, with its own calibration probe. Untouched code never
#: legitimately doubles, so a surviving >2x after the retry is a real
#: regression; a retry that lands back near the reference is contention,
#: attributed in-artifact instead of generating a round of `weak` flags.
RETRY_FACTOR = 2.0
#: Cap on retried queries per run: if the host is globally slow, EVERY
#: query trips the rule and retries would double the bench wall time —
#: the suite-level host_factor already explains that case. Overflow is
#: recorded in `retry_skipped` so the denominator stays auditable.
RETRY_BUDGET = 40


def _load_quiet_ref() -> dict[str, float]:
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_QUIET_REF.json"
    )
    try:
        with open(path) as fh:
            return dict(json.load(fh).get("queries", {}))
    except (OSError, ValueError):
        return {}


def main() -> None:
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
    from mql5_economic_news_data_pipeline_2025_gcp__spark.session import get_spark

    spark = get_spark("bench")
    # The handful of post-aggregation presentation stages that rank a
    # small aggregate globally (documented approx-quantile seams) emit a
    # WindowExec single-partition WARN per run; at 200+ queries × N
    # iterations the repeated warnings dominate the driver's bounded
    # stdout tail and have twice nearly decapitated the summary line.
    # Bench output is for the one JSON contract line — drop to ERROR.
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM JIT + AQE + parquet footer caches + Python worker
    # daemons (pandas-UDF queries otherwise pay ~8 s one-time spawn cost)
    REGISTRY["evt_typed_scan"].spark_fn(spark, SF_DIR).count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    # Best-of-N per query: iteration 1 pays one-time codegen compilation
    # for that query's operators; later iterations measure the plan
    # itself. min damps noisy-neighbor CPU spikes on shared hosts —
    # min-of-2 still showed ±1.6× swings on two queries r4→r5, so the
    # default is 3 (round-5 verdict task #5).
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    bench_set = (
        [q for q in only.split(",") if q in set(BENCH_QUERIES)]
        if only
        else BENCH_QUERIES
    )
    # calibration brackets the query loop (3 runs before + 3 after) AND
    # is interleaved every PROBE_EVERY queries: the suite-level
    # host_factor cannot explain per-query 4x swings under bursty load
    # (round-9 host_noise 1.433 produced six phantom 2.5-4x
    # "regressions" a manual isolation session had to disprove —
    # BENCH_NOTES.md). Each query records its NEAREST probe, so
    # artifact readers get a per-query normalization that tracks load
    # at the moment the query actually ran (round-9 verdict task 3).
    calib_runs = _calibrate(spark)
    probe_every = int(os.environ.get("SPARK_GRAFT_BENCH_PROBE_EVERY", "25"))
    # probe_trace: (queries-completed-when-sampled, probe_sec); seeded
    # with the pre-loop bracket median position 0
    probe_trace: list[tuple[int, float]] = [(0, sorted(calib_runs)[1])]
    quiet_ref = _load_quiet_ref()
    timings: dict[str, float] = {}
    all_iters: dict[str, list[float]] = {}
    query_pos: dict[str, int] = {}
    retries: dict[str, dict] = {}
    retry_skipped: list[str] = []

    def _time_runs(spec, n: int) -> list[float]:
        out: list[float] = []
        for _ in range(n):
            t0 = time.time()
            df = spec.spark_fn(spark, SF_DIR)
            # noop sink forces full materialization of every output column
            # (count() would let Catalyst prune computed columns)
            df.write.format("noop").mode("overwrite").save()
            out.append(round(time.time() - t0, 3))
        return out

    for qi, name in enumerate(bench_set):
        if qi and qi % probe_every == 0:
            probe_trace.append((qi, _calibrate(spark, n=1)[0]))
        spec = REGISTRY[name]
        runs = _time_runs(spec, iters)
        # min damps noisy-neighbor spikes; the full iteration list is kept
        # so artifact readers can tell host noise from a real regression
        # (the r6 driver artifact ran on a loaded host and manufactured 11
        # phantom >1.5x "regressions" that only the committed bench
        # history could disprove — round-6 verdict task #4).
        ref = quiet_ref.get(name)
        if ref and min(runs) > RETRY_FACTOR * ref and len(retries) >= RETRY_BUDGET:
            retry_skipped.append(name)
        elif ref and min(runs) > RETRY_FACTOR * ref:
            # outlier vs committed quiet history: retry once, NOW, with a
            # dedicated probe so the artifact can attribute the spike to
            # host load (probe also high) or to the plan (probe quiet,
            # query still slow = real regression)
            spark.catalog.clearCache()
            retry_probe = _calibrate(spark, n=1)[0]
            retry_runs = _time_runs(spec, iters)
            retries[name] = {
                "quiet_ref": ref,
                "pre_retry_min": min(runs),
                "retry_runs": retry_runs,
                "retry_probe_sec": retry_probe,
                "cleared": min(retry_runs) <= RETRY_FACTOR * ref,
                # where in the suite the spike happened: round-12's
                # uncleared retries all fired deep in the run (JVM
                # codegen-cache/GC pressure a quiet probe can't see);
                # a position near len(bench_set) says "suite-tail
                # pressure", a small one says "look harder"
                "position": qi,
                "n_queries": len(bench_set),
            }
            runs = runs + retry_runs
        timings[name] = min(runs)
        all_iters[name] = runs
        query_pos[name] = qi
        # operators that persist() intermediates (jaccard inverted index,
        # CC edge list) must not leak cache blocks into later queries —
        # accumulated executor-memory pressure inflates every timing
        # after them (measured 3-4x on the iterative queries)
        spark.catalog.clearCache()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # host_noise: median across queries of (max iter / min iter). ~1.0-1.3
    # on a quiet host; >>1.3 flags a loaded host whose per-query numbers
    # should not be read as regressions.
    spreads = sorted(
        max(r) / min(r) for r in all_iters.values() if r and min(r) > 0
    )
    host_noise = round(spreads[len(spreads) // 2], 3) if spreads else None
    post_runs = _calibrate(spark)
    probe_trace.append((len(bench_set), sorted(post_runs)[1]))
    calib_runs += post_runs
    cs = sorted(calib_runs)
    calib_sec = round((cs[len(cs) // 2 - 1] + cs[len(cs) // 2]) / 2, 3)
    # never normalize DOWNWARD past the reference: a host faster than the
    # reference would deflate the total and hide real regressions
    host_factor = round(max(1.0, calib_sec / CALIB_REF_SEC), 3)
    # per-query normalization by the NEAREST interleaved probe (by run
    # position): q / max(1, probe/ref). Readers comparing rounds should
    # prefer these when host_noise is high — a probe taken within
    # ~probe_every queries of the measurement reflects the load the
    # query actually saw, which the run-wide median cannot.
    def _nearest_probe(pos: int) -> float:
        return min(probe_trace, key=lambda pr: abs(pr[0] - pos))[1]

    queries_normalized = {
        name: round(
            t / max(1.0, _nearest_probe(query_pos[name]) / CALIB_REF_SEC), 3
        )
        for name, t in timings.items()
    }
    value = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total_wall",
        "value": value,
        "value_normalized": round(value / host_factor, 3),
        "unit": "sec",
        "iterations": iters,
        "agg": "min",
        "host_noise": host_noise,
        "calib_sec": calib_sec,
        "calib_ref_sec": CALIB_REF_SEC,
        "calib_runs": calib_runs,
        "host_factor": host_factor,
        "queries": timings,
        "queries_normalized": queries_normalized,
        "probe_trace": [[p, s] for p, s in probe_trace],
        "probe_every": probe_every,
        "retry_factor": RETRY_FACTOR,
        "retry_budget": RETRY_BUDGET,
        "retries": retries,
        "retry_skipped": retry_skipped,
        "iters": all_iters,
        # headline scope: registry queries NOT in the bench set (and
        # why, structurally): rows-only/streaming scaffolding floors and
        # SCALE.md-documented exclusions — recorded so "covered
        # everything" can be audited rather than assumed
        "excluded": sorted(set(REGISTRY) - set(bench_set)),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # The driver captures stdout with a bounded tail — BENCH_r03 lost 80+
    # per-query entries to truncation. Persist the full dict to a file it
    # can pick up whole, then print the one-line contract.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_RESULTS.json"),
    )
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # The driver's stdout capture keeps a bounded TAIL; a ~6 KB line gets
    # its head cut and fails to parse (BENCH_r04 `parsed: null`). The
    # LAST printed line must therefore be small: same contract fields,
    # but `queries` holds only the slowest 10 — full per-query detail
    # lives in BENCH_RESULTS.json above.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    summary = {
        "metric": result["metric"],
        "value": result["value"],
        "value_normalized": result["value_normalized"],
        "host_factor": host_factor,
        "unit": "sec",
        "sf": result["sf"],
        "n_queries": len(timings),
        "iterations": iters,
        "agg": "min",
        "n_retries": len(retries),
        "n_retries_cleared": sum(1 for r in retries.values() if r["cleared"]),
        "queries": slowest,
        "full_results": os.path.basename(out_path),
    }
    line = json.dumps(summary)
    assert len(line) <= 1024, f"summary line {len(line)}B exceeds driver budget"
    print(line)


if __name__ == "__main__":
    main()
