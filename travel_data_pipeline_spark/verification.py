"""Driver-sample ordering.

The driver's correctness harness verifies the FIRST 50 entries of
``__spark_entry__.queries()`` each round (CORRECTNESS_r02.json is
exactly registry positions 0-49). The registry (200+ queries) has
outgrown that budget ~4x, so we rotate deliberately: queries with no
green CORRECTNESS row yet are listed first, in priority order, so
every round's sample maximizes newly-verified coverage.

``GREEN`` records names with a green row in any prior round's
CORRECTNESS_r{N}.json; update it each round from the driver output
(tools/update_green.py). ``PRIORITY_HEAD`` pins the exact head order.

Re-proof policy (stated r03, amended r04): every query whose Spark or
oracle logic changed in a round gets a re-proof seat in the NEXT
round's head — unless never-green names saturate all 50 slots, in
which case changed queries are sweep-validated locally
(tools/sweep_oracles.py at sf0.01 and sf0.1) and overflow to the
following round's head. Round 4 hit that exception (50 never-green
names); round 5's head therefore carries both the 32 remaining
never-green names and the 6 overflowed round-4 re-proofs.
"""

from __future__ import annotations

# Green in CORRECTNESS_r01-r06.json (240 names — every registered
# query driver-certified; regenerate with tools/update_green.py).
GREEN: frozenset[str] = frozenset({
    "a1_recent_prior_means",
    "a2_last_value",
    "a3_pricing_summary",
    "a5_pivot_wide",
    "ab_assignment_outcomes",
    "abc_pareto_classes",
    "acf_daily_counts",
    "active_day_streaks",
    "alias_standardize_keywords",
    "anomaly_event_rate",
    "anomaly_prequential",
    "anti_join_idle_customers",
    "approx_distinct_daily_users",
    "approx_percentile_certified",
    "asof_last_order",
    "asof_prev_order_tolerance",
    "attribution_last_click",
    "attribution_multi_touch",
    "benford_first_digit",
    "bigram_lm_perplexity",
    "bloom_prefilter_join",
    "bm25_scores",
    "boilerplate_line_removal",
    "bpe_merge_candidates",
    "bpe_train_merges",
    "chi2_event_type_by_dow",
    "classifier_auc_rank",
    "classifier_eval_metrics",
    "classifier_threshold_sweep",
    "cms_heavy_hitters",
    "cohort_ltv_curve",
    "column_profile_stats",
    "compaction_bin_packing",
    "containment_pairs",
    "contamination_bloom_prefilter",
    "contamination_ngram_overlap",
    "copurchase_bfs_hops",
    "copurchase_pagerank",
    "copurchase_triangles",
    "corpus_vocab_topk",
    "corr_matrix_lineitem",
    "cube_order_priorities",
    "cusum_changepoint_daily",
    "daily_new_returning_users",
    "dataset_card_stats",
    "dataset_snapshot_diff",
    "dau_wau_mau",
    "decile_bins_order_value",
    "dedup_canonical_by_quality",
    "dedup_canonical_map",
    "dedup_cluster_components",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_incremental_lsh",
    "dedup_minhash_jaccard",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard_blocked",
    "dedup_rate_by_source",
    "dedup_simhash_fingerprints",
    "distinct_aggregates",
    "doc_chunks_overlap",
    "dq_constraint_violations",
    "drift_psi_event_values",
    "embedding_cosine_topk",
    "embedding_ivf_topk",
    "embedding_label_centroids",
    "embedding_norm_stats",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "epoch_replication_plan",
    "event_pattern_match",
    "event_transition_matrix",
    "ewma_values_per_user",
    "exchange_monthly_map_long",
    "exchange_pipeline_scores",
    "exists_subquery_parts",
    "f8_dropna_meta_join",
    "f9_route_filter",
    "flight_display_renames",
    "flight_nested_flatten",
    "flight_value_agg_variant",
    "flight_value_w2_j4",
    "full_outer_hourly_reconciliation",
    "funnel_time_to_convert",
    "funnel_view_click_purchase",
    "funnel_windowed_stages",
    "fuzzy_alias_levenshtein",
    "gapfill_hourly_interpolate",
    "gini_customer_revenue",
    "grouping_sets_revenue",
    "heaps_law_vocab_growth",
    "hhi_market_concentration",
    "histogram_order_values",
    "holt_linear_daily",
    "hybrid_search_rrf",
    "interval_overlap_join",
    "interval_union_coverage",
    "intradoc_segment_dedup",
    "inverted_index_postings",
    "ivf_quantized_rerank",
    "j2_dim_fanout",
    "j3_standardize_defaults",
    "j5_explode_join",
    "j6_map_literal",
    "j9_attractiveness",
    "json_quarantine_split",
    "k_anonymity_audit",
    "kaplan_meier_lifetime",
    "keyword_coverage_audit",
    "kmeans_embeddings",
    "langid_confusion_matrix",
    "lsh_scurve_audit",
    "mad_outliers_events",
    "market_basket_lift",
    "master_currency_fanout",
    "master_dim_countries",
    "median_two_pass_orders",
    "minhash_estimate_error",
    "mixture_rebalance_plan",
    "mixture_weights_by_source",
    "mmr_diversified_topk",
    "mode_priority_by_status",
    "multimodal_decode_meta",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "multimodal_resize_meta",
    "mutual_info_event_dow",
    "nearest_error_event",
    "negative_sample_pairs",
    "nullsafe_join_props",
    "o2_union_all",
    "pack_token_shards",
    "padding_waste_audit",
    "partition_stats_orders",
    "pca_embeddings_by_label",
    "percentiles_order_value",
    "pii_redaction",
    "pipeline_chunked_shards",
    "pipeline_data_health",
    "pipeline_training_data",
    "pmi_term_pairs",
    "ppjoin_prefix_candidates",
    "quality_classifier_logistic",
    "rake_keyword_extraction",
    "range_join_value_tiers",
    "record_linkage_blocked",
    "recursive_nation_hierarchy",
    "referential_integrity_audit",
    "reservoir_sample_per_lang",
    "retention_cohorts",
    "revenue_decile_bands",
    "revenue_share_within_region",
    "rfm_customer_segments",
    "rolling_corr_purchase_error",
    "rollup_revenue",
    "salted_join_orders_customers",
    "sample_stratified_by_lang",
    "scd2_event_type_history",
    "seasonality_monthly_index",
    "semantic_dedup",
    "semi_join_active_customers",
    "sentence_explode_outer",
    "session_gap_sensitivity",
    "session_top_paths",
    "session_window_builtin",
    "sessionize_events",
    "setop_intersect_except",
    "shard_writer_manifest",
    "shuffle_block_mixing",
    "simhash_near_pairs",
    "skew_report_partkeys",
    "sliding_hourly_counts",
    "source_lang_entropy",
    "source_quality_quartiles",
    "source_term_log_odds",
    "split_leakage_check",
    "split_train_valid_test",
    "stats_aggregates",
    "stratified_kfold_assign",
    "t2_task_messages",
    "table_fingerprints",
    "target_encode_loo_segment",
    "temporal_tier_join",
    "text_curation_flags",
    "text_fingerprints",
    "text_lang_id",
    "text_quality_scores",
    "text_readability_scores",
    "text_repetition_signals",
    "text_token_stats",
    "tfidf_top_terms",
    "theil_sen_daily_trend",
    "token_entropy_quality",
    "tokenizer_fertility_by_lang",
    "topk_movers_parts",
    "topn_other_nations_revenue",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_late_priority_counts",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier_cnt",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_filters",
    "tpch_q20_heavy_part_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers",
    "tpch_q2_min_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "trailing_hour_range_window",
    "trend_slope_by_nation",
    "trends_ispartial_drop",
    "trends_pipeline_scores",
    "tumbling_hourly",
    "user_lifecycle_states",
    "vocab_oov_by_source",
    "w1_rolling_mean",
    "w2_top3_orders_per_customer",
    "w3_growth_epsilon",
    "w4_unpivot",
    "w_rank_lag_lead",
    "watermark_lateness_plan",
    "weighted_sample_docs",
    "window_distribution_suite",
    "window_running_frames",
    "winsorized_mean_by_type",
    "x19_json_extract",
    "x7_x8_time_suite",
    "x_date_suite",
    "zipf_slope_vocab",
    "zone_map_skip_audit",
    "zorder_interleaved_key",
})

# Round-7 head. Certification is total (240/240 green cumulatively;
# r06 sample 50/50). Seats follow the re-proof policy:
#   [0..9]   the 10 long-green churn/headliner seats that overflowed
#            round 6's 60-name head (its sample stopped at
#            rake_keyword_extraction; these were positions 50-59).
#   [10..]   round-7 changed-code re-proof seats (queries whose Spark
#            or oracle logic changes this round), then the new round-7
#            queries, then high-churn greens back-filling to ~50.
#
# ROUND-8 ROTATION NOTE (pinned at round-7 end): the head holds 53
# names for 50 seats — every overflow/re-proof/new seat (positions
# 0..37) is inside the sample; the LAST 3 long-green churn seats
# (zone_map_skip_audit, classifier_threshold_sweep,
# attribution_multi_touch) overflow to the round-8 head per the same
# policy round 6 used. No re-proof debt carries unless r07 shows red.
#
# Round-8 head recipe (after tools/update_green.py CORRECTNESS_r07):
# any new red rows first, then the 3 churn overflow seats above, then
# ONE round-7-changed-code re-proof seat (count_min_heavy_hitters —
# refactored onto the shared cm_pairs/user_cm_cells builders for the
# streaming twin; plan-identical, sweep-validated at 3 SFs), then the
# 18 round-9 queries (ordered_names already queues them at positions
# 54-71: ab_sprt_curve .. cuped_variance_reduction), then as many of
# the 20 round-10 queries (positions 72-91:
# length_drift_wasserstein, ab_power_mde, dp_noisy_event_counts,
# ipw_ate_stratified, conformal_interval_coverage,
# negative_sampling_table, hill_tail_index,
# vocab_jaccard_source_matrix, dup_pairs_cross_shard,
# image_ahash_neardup, neardup_chain_inflation, t_closeness_audit,
# bm25_ndcg_at_k, brier_decomposition, hash_split_uniformity_audit,
# markov_removal_attribution, holt_backtest_mape, ipf_raking_weights,
# eval_scorecard, quantization_distortion_bins) as fit; the remainder
# overflow to round 9's head. All 38 are sweep-validated at
# sf0.001/0.01/0.1. Then high-churn greens.
PRIORITY_HEAD: tuple[str, ...] = (
    # --- round-6 overflow seats (10, long-green, carried per policy) ---
    "heaps_law_vocab_growth",
    "flight_value_w2_j4",
    "exchange_pipeline_scores",
    "trends_pipeline_scores",
    "a3_pricing_summary",
    "w2_top3_orders_per_customer",
    "sessionize_events",
    "j2_dim_fanout",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_profit",
    # --- round-7 changed-code re-proof seats ---
    "theil_sen_daily_trend",      # median re-routed through two-phase
    "bpe_train_merges",           # shares merge-fold code with apply
    "text_lang_id",               # language_pred single-build (ADVICE)
    "langid_confusion_matrix",    # same language_pred rework
    "dedup_incremental_lsh",      # streaming grow-mode key canon (ADVICE)
    # --- round-7 NEW queries (names appended as each one lands) ---
    "ivf_recall_at_k",
    "bpe_apply_learned",
    "quantile_sketch_merge",
    "incremental_recompute_plan",
    "contamination_source_matrix",
    "stratified_group_split",
    "ngram_novelty_curve",
    "cdf_calibration_bins",
    "hyperloglog_union_audit",
    "rolling_retention_matrix",
    "order_value_histogram_log",
    "sampling_design_effect",
    "dedup_survivorship_merge",
    "skew_key_salting_plan",
    "count_min_heavy_hitters",
    "join_size_estimation_audit",
    "quality_filter_funnel",
    "classifier_agreement_kappa",
    "hll_running_distinct_curve",
    "mixture_temperature_plan",
    "data_scaling_ladder",
    "recency_decay_weights",
    "ks_source_drift",
    # --- high-churn greens back-filling the 50 ---
    "dedup_minhash_lsh",
    "dedup_exact",
    "pipeline_training_data",
    "embedding_cosine_topk",
    "embedding_ivf_topk",
    "ivf_quantized_rerank",
    "watermark_lateness_plan",
    "session_gap_sensitivity",
    "shard_writer_manifest",
    "contamination_bloom_prefilter",
    "source_quality_quartiles",
    "vocab_oov_by_source",
    "zone_map_skip_audit",
    "classifier_threshold_sweep",
    "attribution_multi_touch",
)


def ordered_names(registered: list[str]) -> list[str]:
    """Driver-facing order: PRIORITY_HEAD first, then remaining
    never-green names in registry order, then the green backlog."""
    reg = set(registered)
    head = [n for n in PRIORITY_HEAD if n in reg]
    head_set = set(head)
    rest_unverified = [n for n in registered
                       if n not in head_set and n not in GREEN]
    rest_green = [n for n in registered
                  if n not in head_set and n in GREEN]
    return head + rest_unverified + rest_green
