"""Driver-sample ordering.

The driver's correctness harness verifies the FIRST 50 entries of
``__spark_entry__.queries()`` each round (CORRECTNESS_r02.json is
exactly registry positions 0-49). The registry (160+ queries) has
outgrown that budget ~3x, so we rotate deliberately: queries with no
green CORRECTNESS row yet are listed first, in priority order, so
every round's sample maximizes newly-verified coverage.

``GREEN`` records names with a green row in any prior round's
CORRECTNESS_r{N}.json; update it each round from the driver output
(tools/update_green.py). ``PRIORITY_HEAD`` pins the exact head order:
the never-verified backlog first (round 4: the 37 TPC-H/stats tail),
then this round's new queries, then re-proof slots for every query
whose Spark or oracle logic changed this round (ADVICE r03: changed
queries must re-enter the sample, the way sessionize_events/scd2 did).
"""

from __future__ import annotations

# Green in CORRECTNESS_r01/r02/r03.json (122 names, all three rounds
# fully green — regenerate with tools/update_green.py).
GREEN: frozenset[str] = frozenset({
    "a1_recent_prior_means",
    "a2_last_value",
    "a3_pricing_summary",
    "a5_pivot_wide",
    "alias_standardize_keywords",
    "anti_join_idle_customers",
    "approx_distinct_daily_users",
    "approx_percentile_certified",
    "asof_last_order",
    "attribution_last_click",
    "bigram_lm_perplexity",
    "bloom_prefilter_join",
    "bm25_scores",
    "boilerplate_line_removal",
    "cms_heavy_hitters",
    "containment_pairs",
    "contamination_ngram_overlap",
    "copurchase_pagerank",
    "copurchase_triangles",
    "corpus_vocab_topk",
    "corr_matrix_lineitem",
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
    "doc_chunks_overlap",
    "dq_constraint_violations",
    "embedding_cosine_topk",
    "embedding_ivf_topk",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "event_pattern_match",
    "event_transition_matrix",
    "ewma_values_per_user",
    "exchange_monthly_map_long",
    "exchange_pipeline_scores",
    "f8_dropna_meta_join",
    "f9_route_filter",
    "flight_nested_flatten",
    "flight_value_agg_variant",
    "flight_value_w2_j4",
    "full_outer_hourly_reconciliation",
    "funnel_view_click_purchase",
    "fuzzy_alias_levenshtein",
    "histogram_order_values",
    "hybrid_search_rrf",
    "interval_overlap_join",
    "ivf_quantized_rerank",
    "j2_dim_fanout",
    "j3_standardize_defaults",
    "j5_explode_join",
    "j6_map_literal",
    "j9_attractiveness",
    "kmeans_embeddings",
    "mad_outliers_events",
    "market_basket_lift",
    "master_currency_fanout",
    "master_dim_countries",
    "minhash_estimate_error",
    "mixture_weights_by_source",
    "mmr_diversified_topk",
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "nullsafe_join_props",
    "o2_union_all",
    "pack_token_shards",
    "pca_embeddings_by_label",
    "pii_redaction",
    "pipeline_chunked_shards",
    "pipeline_training_data",
    "pmi_term_pairs",
    "quality_classifier_logistic",
    "recursive_nation_hierarchy",
    "reservoir_sample_per_lang",
    "retention_cohorts",
    "revenue_share_within_region",
    "rfm_customer_segments",
    "rollup_revenue",
    "sample_stratified_by_lang",
    "scd2_event_type_history",
    "semantic_dedup",
    "semi_join_active_customers",
    "sentence_explode_outer",
    "sessionize_events",
    "setop_intersect_except",
    "simhash_near_pairs",
    "skew_report_partkeys",
    "sliding_hourly_counts",
    "split_train_valid_test",
    "t2_task_messages",
    "table_fingerprints",
    "text_curation_flags",
    "text_fingerprints",
    "text_lang_id",
    "text_quality_scores",
    "text_repetition_signals",
    "text_token_stats",
    "tfidf_top_terms",
    "token_entropy_quality",
    "tpch_q18_large_orders",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "trailing_hour_range_window",
    "trends_pipeline_scores",
    "tumbling_hourly",
    "w1_rolling_mean",
    "w2_top3_orders_per_customer",
    "w3_growth_epsilon",
    "w4_unpivot",
    "w_rank_lag_lead",
    "weighted_sample_docs",
    "winsorized_mean_by_type",
    "x19_json_extract",
    "x7_x8_time_suite",
    "x_date_suite",
})

# Exact head order for round 4's 50-query driver sample:
#   [0..36]  the 37 never-verified names (TPC-H tail + stats + windows)
#            -> closes driver certification to every registered query.
#   [37..49] round-4 additions: P1/P4/F7 partial closures, the
#            operational-platform layer (queries_ops: linkage,
#            compaction, anomaly x2, PSI drift; inverted index), and
#            the governance layer (leakage/datasheet/negatives/
#            fertility in queries_curation).
# Names absent from the registry are skipped harmlessly.
PRIORITY_HEAD: tuple[str, ...] = (
    # --- never-verified backlog (37) ---
    "tpch_q2_min_supplier",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_late_priority_counts",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier_cnt",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_filters",
    "tpch_q20_heavy_part_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers",
    "grouping_sets_revenue",
    "cube_order_priorities",
    "percentiles_order_value",
    "distinct_aggregates",
    "window_running_frames",
    "window_distribution_suite",
    "exists_subquery_parts",
    "range_join_value_tiers",
    "stats_aggregates",
    "trend_slope_by_nation",
    "salted_join_orders_customers",
    "decile_bins_order_value",
    "chi2_event_type_by_dow",
    "mode_priority_by_status",
    "partition_stats_orders",
    "zorder_interleaved_key",
    "gapfill_hourly_interpolate",
    "session_window_builtin",
    "temporal_tier_join",
    # --- round-4 additions (P1 / P4 / F7 closures) ---
    "trends_ispartial_drop",
    "flight_display_renames",
    "keyword_coverage_audit",
    # --- round-4 additions (operational-platform layer) ---
    "record_linkage_blocked",
    "compaction_bin_packing",
    "anomaly_event_rate",
    "inverted_index_postings",
    # --- round-4 additions (governance layer) ---
    "split_leakage_check",
    "dataset_card_stats",
    "negative_sample_pairs",
    "tokenizer_fertility_by_lang",
    "anomaly_prequential",
    "drift_psi_event_values",
    # --- re-proofs: none fit — the 50 never-green names fill every
    # slot. The changed-code queries that wanted re-proof seats
    # (dedup_cluster_components, market_basket_lift, semantic_dedup,
    # pca_embeddings_by_label, quality_classifier_logistic,
    # copurchase_pagerank) overflow to the round-5 head; every one is
    # sweep-validated at sf0.01 AND sf0.1 locally, and the CC rewrite
    # is additionally pinned by an equivalence test against the old
    # propagation path plus the 1M-chain stress stage.
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
