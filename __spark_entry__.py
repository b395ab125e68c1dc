"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — duckdb-equivalent SQL per query key.

Column names are aliased identically on both sides; every query has a
deterministic result SET (ties broken by a unique key before any LIMIT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from weaviate_spark.entry_queries import QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: filter + multi-key sort + limit over customer (M1 slice)."""
    return QUERIES["filter_sort_limit"](spark, "/root/testdata/sf0.001")


# Query names already covered by a driver CORRECTNESS_r0{1..8}.json run.
# The driver samples a window of the registry per round, so queries() lists
# never-yet-driver-checked entries FIRST (newest operators, quantization
# family, sampling/PII/curation…) — every registered query keeps its oracle
# either way; this only steers the sample toward unproven entries.
_DRIVER_CHECKED = frozenset({
    "agg_array_elements", "agg_boolean", "agg_date_median_mode", "agg_date_minmax",
    "agg_group_limit", "agg_hybrid_object_limit", "agg_median_mode", "agg_meta_count",
    "agg_object_limit", "agg_pricing_summary", "agg_region_nation_rollup",
    "agg_top_occurrences", "agg_top_occurrences_grouped", "agg_type_pointing_to",
    "ann_ivf_topk", "ann_lsh_topk", "blob_hash", "bm25_and_operator", "bm25_autocut",
    "bm25_min_or", "bm25_topk", "bm25_unicode_fold", "boost_rerank", "contextual_classification",
    "decontaminate_overlap", "dedup_embedding_cosine", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "events_json_props", "events_purchase_attribution",
    "events_session_agg", "events_windowed_counts", "explore_cross_class",
    "filter_array_contains_all", "filter_contains_any", "filter_date_range",
    "filter_geo_within_range", "filter_len_property", "filter_like_prefix",
    "filter_like_wildcard", "filter_not_two_valued", "filter_sort_limit",
    "filter_tokenized_equal", "filter_tokenized_equal_array", "filter_tokenized_like",
    "graphql_aggregate_parsed", "graphql_get_parsed", "group_merge_closest",
    "hybrid_distance_cutoff", "hybrid_explain_score", "hybrid_explain_score_rrf",
    "hybrid_group_by", "hybrid_relative_score", "hybrid_rrf", "id_synthesis_cursor",
    "json_query_parsed", "knn_bq_rescore", "knn_classification", "knn_cosine_topk",
    "knn_filtered", "knn_l2_within_distance", "knn_multi_target", "knn_multi_target_relative",
    "knn_named_vectors_min", "knn_named_vectors_weighted", "knn_near_object",
    "knn_pq_rescore", "knn_rq_rescore", "mmr_rerank_topk", "multimodal_image_features",
    "multivector_maxsim_topk", "multivector_muvera_topk", "near_image_topk",
    "neartext_move_topk", "neartext_rerank_generate", "ner_token_entities",
    "pack_sequences_budget", "pagination_offset", "pii_scrub_profile",
    "pipeline_corpus_curation", "qna_extractive_answer", "ref_count", "ref_fact_join_agg",
    "ref_filter_semijoin", "ref_resolve_2hop", "sample_hash_fraction",
    "sample_stratified", "search_group_by", "search_group_by_array", "search_group_by_struct",
    "semantic_dedup", "sort_multikey_supplier", "spellcheck_corrected_search",
    "split_train_val", "stateful_user_totals", "sum_top_tokens", "tenant_scoped_read",
    "text_bpe_token_counts", "text_cjk_dict_segmentation", "text_quality_scores",
    "text_tokens_by_lang", "text_unicode_tokens", "video_avi_mjpeg_frames",
    "video_frame_luma", "zeroshot_classification",
    # green in CORRECTNESS_r05/r06 (added r07 so the driver window
    # keeps converging on the never-checked tail):
    "agg_percentiles", "agg_rollup_region_nation", "audio_band_energy",
    "audio_frame_features", "curation_doc_chunks", "curation_dsir_weights",
    "curation_html_extract", "curation_line_dedup", "dedup_fuzzy_names",
    "dedup_keep_best_quality", "dedup_lsh_recall_audit", "dedup_minhash_clusters",
    "dedup_simhash_stress", "dedup_substring_pairs", "embedding_hard_negatives",
    "embedding_label_outliers", "events_anomaly_zscore",
    "events_asof_click_attribution", "events_funnel_conversion",
    "events_gap_fill_locf", "events_retention_cohorts", "fact_fact_join_bucketed",
    "graph_pagerank_trade", "graph_triangle_count", "image_dhash_neardup",
    "knn_cosine_topk_quantized", "knn_matryoshka_topk", "part_skyline_pareto",
    "profile_lineitem_columns", "ref_fact_join_agg_bucketed", "ref_filter_chain_3hop",
    "sample_temperature_mixture", "sample_weighted_topk", "scd2_event_type_history",
    "sketch_bloom_decontaminate", "sketch_cms_heavy_hitters",
    "sketch_distinct_hll_kmv", "sketch_histogram_quantiles", "sketch_kmv_set_overlap",
    "text_bigram_perplexity", "text_hash_embed_knn", "text_quality_percentiles",
    "text_readability_flesch", "text_repetition_filter", "text_tfidf_cosine_topk",
    "text_tfidf_keywords", "text_unigram_xent", "tokenizer_bpe_encode",
    "tokenizer_bpe_train", "video_scene_cuts",
    # green in CORRECTNESS_r07 (50/50 — added r08 so the driver window
    # covers the final never-checked tail):
    "abtest_two_proportion_z", "agg_cube_orders", "agg_trimmed_mean",
    "ann_ivfpq_topk", "ann_lsh_multiprobe", "corpus_js_divergence",
    "dedup_containment", "dedup_minhash_bbit", "drift_psi_value",
    "embedding_group_centroids", "embedding_kmeans", "events_cusum_changepoints",
    "events_dow_seasonality", "events_ewma_daily", "events_kaplan_meier",
    "events_markov_transitions", "events_ohlc_daily", "events_roc_auc",
    "events_rolling_features", "events_sessionize_gap", "events_temporal_neighbors",
    "events_top_paths", "feature_quantile_binning", "forecast_ols_trend",
    "geo_neighbor_pairs", "gini_revenue_concentration", "graph_assortativity",
    "graph_kcore_trade", "graph_sssp_trade", "knn_query_batch", "knn_sq_rescore",
    "market_basket_brand_lift", "mv_incremental_pricing",
    "orders_value_percentiles_by_priority", "pareto_revenue_share",
    "profile_benford_digits", "profile_chisq_independence", "profile_mad_outliers",
    "profile_mutual_information", "profile_numeric_correlations",
    "reco_item_item_cosine", "reco_user_topn", "score_calibration_bins",
    "sketch_hll_daily_merge", "split_leakage_safe", "stats_bootstrap_ci",
    "text_collocations_pmi", "tokenizer_wordpiece_encode",
    "validate_expectations", "validate_referential_integrity",

    "agg_grouping_sets", "ann_graph_expand_topk", "ann_graph_hubness", "ann_nndescent_graph",
    "ann_recall_audit", "audio_silence_runs", "curation_nb_classifier", "curation_training_mix",
    "customer_rfm_segments", "dedup_cross_source_matrix", "embedding_centroid_drift", "embedding_dim_stats",
    "embedding_kcenter_coreset", "embedding_pca_top_component", "embedding_silhouette_labels", "events_activity_streaks",
    "events_asof_next_purchase", "events_bot_profile", "events_concurrent_sessions", "events_dormancy_reactivation",
    "events_duplicate_purchases", "events_funnel_latency", "events_interarrival_stats", "events_lag_correlation",
    "events_markov_stationary", "events_rolling_active_users", "graph_clustering_coeff", "graph_link_prediction",
    "graphql_explore_parsed", "hybrid_multi_target", "image_quality_stats", "knn_filtered_quantized",
    "multivector_maxsim_pruned", "orders_cohort_ltv", "orders_revenue_trend", "orders_shipping_delay",
    "part_price_outliers", "reco_user_user_similar", "stats_ks_two_sample", "stats_randomization_test",
    "stats_welch_ttest", "supplier_scorecard", "text_char_entropy", "text_heaps_growth",
    "text_langid_confusion", "text_length_histogram", "text_ngram_novelty", "text_rake_keyphrases",
    "text_zipf_fit", "validate_order_totals",
})


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    unchecked = {n: f for n, f in QUERIES.items() if n not in _DRIVER_CHECKED}
    checked = {n: f for n, f in QUERIES.items() if n in _DRIVER_CHECKED}
    return {**unchecked, **checked}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
