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
    "market_basket_lift", "copurchase_pagerank", "boilerplate_line_removal",
    "bigram_lm_perplexity", "flight_value_w2_j4", "flight_value_agg_variant",
    "a3_pricing_summary", "j2_dim_fanout", "j3_standardize_defaults",
    "j5_explode_join", "j6_map_literal", "semi_join_active_customers",
    "anti_join_idle_customers", "a1_recent_prior_means", "a2_last_value",
    "a5_pivot_wide", "w2_top3_orders_per_customer", "w3_growth_epsilon",
    "w4_unpivot", "o2_union_all", "setop_intersect_except", "rollup_revenue",
    "w_rank_lag_lead", "trailing_hour_range_window",
    "full_outer_hourly_reconciliation", "recursive_nation_hierarchy",
    "tumbling_hourly", "x19_json_extract", "w1_rolling_mean",
    "asof_last_order", "x_date_suite", "histogram_order_values",
    "nullsafe_join_props", "skew_report_partkeys",
    "funnel_view_click_purchase", "sliding_hourly_counts",
    "sentence_explode_outer", "winsorized_mean_by_type",
    "dq_constraint_violations", "revenue_share_within_region",
    "retention_cohorts", "event_transition_matrix", "split_train_valid_test",
    "contamination_ngram_overlap", "sample_stratified_by_lang",
    "pii_redaction", "corpus_vocab_topk", "pack_token_shards",
    # r01 greens not re-sampled in r02
    "exchange_pipeline_scores", "trends_pipeline_scores",
    "flight_nested_flatten", "f9_route_filter", "j9_attractiveness",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume", "tpch_q18_large_volume_customers",
    "dedup_exact", "dedup_minhash_lsh", "dedup_minhash_jaccard",
    "simhash_near_pairs", "dedup_embedding_cosine", "embedding_cosine_topk",
    "embedding_ivf_topk", "text_stats_basic", "text_language_id",
    "text_quality_scores", "text_fingerprints", "pipeline_training_data",
    "multimodal_decode_meta", "exchange_monthly_map_long",
    "sessionize_events",  # green r01, regressed r02 — re-proved via head
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
