"""Driver-sample ordering.

The driver's correctness harness verifies the FIRST 50 entries of
``__spark_entry__.queries()`` each round (CORRECTNESS_r02.json is
exactly registry positions 0-49). The registry (150+ queries) has
outgrown that budget ~3x, so we rotate deliberately: queries with no
green CORRECTNESS row yet are listed first, in priority order, so
every round's sample maximizes newly-verified coverage.

``GREEN`` records names with a green row in any prior round's
CORRECTNESS_r{N}.json; update it each round from the driver output
(tools/update_green.py). ``PRIORITY_HEAD`` pins the exact head order:
regression re-proofs first, then the operator families the judge
called out as unproven (dedup clustering/incremental, search ranking,
sketches), then the rest of the unverified backlog.
"""

from __future__ import annotations

# Green in CORRECTNESS_r01.json or CORRECTNESS_r02.json (73 names).
GREEN: frozenset[str] = frozenset({
    "a1_recent_prior_means",
    "a2_last_value",
    "a3_pricing_summary",
    "a5_pivot_wide",
    "anti_join_idle_customers",
    "asof_last_order",
    "bigram_lm_perplexity",
    "boilerplate_line_removal",
    "contamination_ngram_overlap",
    "copurchase_pagerank",
    "corpus_vocab_topk",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_jaccard",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard_blocked",
    "dedup_simhash_fingerprints",
    "dq_constraint_violations",
    "embedding_cosine_topk",
    "embedding_ivf_topk",
    "event_transition_matrix",
    "exchange_monthly_map_long",
    "exchange_pipeline_scores",
    "f9_route_filter",
    "flight_nested_flatten",
    "flight_value_agg_variant",
    "flight_value_w2_j4",
    "full_outer_hourly_reconciliation",
    "funnel_view_click_purchase",
    "histogram_order_values",
    "j2_dim_fanout",
    "j3_standardize_defaults",
    "j5_explode_join",
    "j6_map_literal",
    "j9_attractiveness",
    "market_basket_lift",
    "multimodal_decode_meta",
    "nullsafe_join_props",
    "o2_union_all",
    "pack_token_shards",
    "pii_redaction",
    "pipeline_training_data",
    "recursive_nation_hierarchy",
    "retention_cohorts",
    "revenue_share_within_region",
    "rollup_revenue",
    "sample_stratified_by_lang",
    "semi_join_active_customers",
    "sentence_explode_outer",
    "sessionize_events",
    "setop_intersect_except",
    "simhash_near_pairs",
    "skew_report_partkeys",
    "sliding_hourly_counts",
    "split_train_valid_test",
    "text_fingerprints",
    "text_lang_id",
    "text_quality_scores",
    "text_token_stats",
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
    "winsorized_mean_by_type",
    "x19_json_extract",
    "x_date_suite",
})

# Exact head order for this round's 50-query driver sample: fixed
# regressions first, then the judge-flagged unproven families, then the
# unverified backlog (highest-value first). Names absent from the
# registry are skipped harmlessly.
PRIORITY_HEAD: tuple[str, ...] = (
    # regression re-proofs (unix_micros/TIMESTAMP_NTZ fix)
    "sessionize_events", "scd2_event_type_history", "interval_overlap_join",
    "f8_dropna_meta_join",
    # 100 TB dedup story: clustering + canonical map + incremental
    "dedup_cluster_components", "dedup_canonical_map", "dedup_incremental_lsh",
    "containment_pairs", "dedup_rate_by_source",
    # search ranking
    "bm25_scores", "hybrid_search_rrf",
    # sketches
    "bloom_prefilter_join", "cms_heavy_hitters", "minhash_estimate_error",
    "approx_distinct_daily_users", "approx_percentile_certified",
    "table_fingerprints",
    # formerly oracle-less, now driver-checkable
    "multimodal_frame_sample", "pca_embeddings_by_label",
    # round-3 additions (new operators, never sampled by definition)
    "semantic_dedup", "mmr_diversified_topk",
    "quality_classifier_logistic", "event_pattern_match",
    "copurchase_triangles", "attribution_last_click",
    "embedding_random_projection", "dedup_canonical_by_quality",
    # bench headliners without a green row
    "kmeans_embeddings", "tfidf_top_terms", "ewma_values_per_user",
    "rfm_customer_segments", "pipeline_chunked_shards",
    # curation / northstar round-2 additions
    "mixture_weights_by_source", "weighted_sample_docs",
    "ivf_quantized_rerank", "text_repetition_signals", "text_curation_flags",
    "embedding_quantize_int8", "token_entropy_quality",
    "doc_chunks_overlap", "pmi_term_pairs", "reservoir_sample_per_lang",
    # dims + misc never-sampled
    "master_dim_countries", "master_currency_fanout",
    "alias_standardize_keywords", "fuzzy_alias_levenshtein",
    "t2_task_messages", "x7_x8_time_suite",
    # stats family
    "mad_outliers_events", "corr_matrix_lineitem", "trend_slope_by_nation",
    "decile_bins_order_value", "chi2_event_type_by_dow",
    "window_distribution_suite", "mode_priority_by_status",
    "salted_join_orders_customers", "partition_stats_orders",
    "zorder_interleaved_key", "gapfill_hourly_interpolate",
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
