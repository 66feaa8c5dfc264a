"""Queries the driver has sampled in past rounds (GENERATED).

Regenerate with ``python tools/gen_driver_sampled.py`` after each
round's CORRECTNESS_r{N}.json lands (tests/conftest.py also
auto-regens at pytest session start). plans/catalog.py orders the
catalog red-at-latest-sampling first (so fixes re-validate the
very next round), then never-sampled, then the green remainder.
"""

# source files: CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r04.json, CORRECTNESS_r05.json, CORRECTNESS_r06.json, CORRECTNESS_r07.json, CORRECTNESS_r08.json, CORRECTNESS_r09.json, CORRECTNESS_r10.json

DRIVER_SAMPLED: frozenset[str] = frozenset({
    "ann_context_packing",  # CORRECTNESS_r04.json
    "ann_cosine_topk",  # CORRECTNESS_r01.json
    "ann_ivf_pq_adc",  # CORRECTNESS_r05.json
    "ann_ivf_topk",  # CORRECTNESS_r01.json, CORRECTNESS_r03.json
    "ann_multiprobe_topk",  # CORRECTNESS_r05.json
    "ann_srp_bucketed",  # CORRECTNESS_r01.json, CORRECTNESS_r03.json
    "ann_topk_pandas",  # CORRECTNESS_r01.json, CORRECTNESS_r03.json
    "benchmark_decontamination",  # CORRECTNESS_r04.json
    "catalog_analyze_stats",  # CORRECTNESS_r08.json
    "catalog_integrity_audit",  # CORRECTNESS_r08.json
    "corpus_ccnet_buckets",  # CORRECTNESS_r10.json
    "corpus_clean_summary",  # CORRECTNESS_r09.json
    "corpus_curriculum_phases",  # CORRECTNESS_r10.json
    "corpus_dataset_card",  # CORRECTNESS_r10.json
    "corpus_dedup_cascade",  # CORRECTNESS_r04.json
    "corpus_dsir_weights",  # CORRECTNESS_r09.json
    "corpus_epoch_shuffle",  # CORRECTNESS_r09.json
    "corpus_heaps_law",  # CORRECTNESS_r09.json
    "corpus_leakage_safe_split",  # CORRECTNESS_r03.json
    "corpus_mixture_weights",  # CORRECTNESS_r09.json
    "corpus_semdedup",  # CORRECTNESS_r05.json
    "corpus_shard_assignment",  # CORRECTNESS_r09.json
    "corpus_temperature_mixture",  # CORRECTNESS_r09.json
    "corpus_zipf_law",  # CORRECTNESS_r09.json
    "customer_clean_rows",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "customer_csv_roundtrip",  # CORRECTNESS_r08.json
    "customer_error_replay",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "customer_error_rows",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "customer_fellegi_sunter",  # CORRECTNESS_r08.json
    "customer_fuzzy_match",  # CORRECTNESS_r07.json
    "customer_golden_records",  # CORRECTNESS_r07.json
    "customer_imputation",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "customer_jaro_winkler_match",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "customer_one_to_one_linkage",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "customer_profile",  # CORRECTNESS_r07.json
    "customer_quality_report",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "customer_sorted_neighborhood",  # CORRECTNESS_r07.json
    "customers_aes_envelope",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "customers_brier_calibration",  # CORRECTNESS_r09.json
    "customers_cogroup_recon",  # CORRECTNESS_r08.json
    "customers_collated_segments",  # CORRECTNESS_r07.json
    "customers_correlated_subquery",  # CORRECTNESS_r07.json, CORRECTNESS_r08.json, CORRECTNESS_r09.json
    "customers_cv_stump",  # CORRECTNESS_r08.json
    "customers_decision_tree",  # CORRECTNESS_r08.json
    "customers_gains_lift",  # CORRECTNESS_r09.json
    "customers_geo_proximity",  # CORRECTNESS_r07.json
    "customers_gini_revenue",  # CORRECTNESS_r08.json
    "customers_hierarchy_rollup",  # CORRECTNESS_r07.json
    "customers_ipw_ate",  # CORRECTNESS_r09.json
    "customers_k_anonymity",  # CORRECTNESS_r04.json
    "customers_l_diversity",  # CORRECTNESS_r04.json
    "customers_lateral_top2_orders",  # CORRECTNESS_r07.json
    "customers_logreg_gd",  # CORRECTNESS_r08.json
    "customers_pseudonymized",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "customers_recursive_root_path",  # CORRECTNESS_r07.json
    "customers_rfm_segments",  # CORRECTNESS_r08.json
    "customers_rtbf_purge_audit",  # CORRECTNESS_r02.json
    "customers_setops_cohorts",  # CORRECTNESS_r06.json
    "customers_snapshot_changelog",  # CORRECTNESS_r02.json
    "customers_t_closeness",  # CORRECTNESS_r07.json
    "customers_union_evolving_schema",  # CORRECTNESS_r07.json
    "customers_without_bulk_orders",  # CORRECTNESS_r06.json
    "dathang_csv_quality",  # CORRECTNESS_r06.json
    "dathang_fk_validation",  # CORRECTNESS_r01.json
    "dedup_blocking_quality",  # CORRECTNESS_r04.json
    "dedup_clusters",  # CORRECTNESS_r04.json
    "dedup_clusters_bcubed",  # CORRECTNESS_r04.json
    "dedup_clusters_largestar",  # CORRECTNESS_r04.json
    "dedup_exact",  # CORRECTNESS_r01.json, CORRECTNESS_r03.json
    "dedup_incremental_against_store",  # CORRECTNESS_r04.json
    "dedup_keep_best",  # CORRECTNESS_r04.json
    "dedup_minhash_lsh",  # CORRECTNESS_r01.json
    "dedup_ngram_jaccard",  # CORRECTNESS_r01.json
    "dedup_prefix_filter_join",  # CORRECTNESS_r04.json
    "dedup_simhash",  # CORRECTNESS_r01.json
    "dedup_threshold_sweep",  # CORRECTNESS_r04.json
    "dim_customer_bitemporal",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "dim_customer_scd2",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "dim_customer_scd2_incremental",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "dim_customer_scd2_streaming",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "dim_date",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "dim_date_holidays",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "dim_date_tet_holidays",  # CORRECTNESS_r02.json
    "doc_bm25_search",  # CORRECTNESS_r10.json
    "doc_bpe_encode",  # CORRECTNESS_r10.json
    "doc_bpe_pair_counts",  # CORRECTNESS_r09.json
    "doc_bpe_train",  # CORRECTNESS_r10.json
    "doc_bpe_train_merges",  # CORRECTNESS_r09.json
    "doc_cdc_chunk_dedup",  # CORRECTNESS_r04.json
    "doc_charlm_score",  # CORRECTNESS_r09.json
    "doc_chunk_packing",  # CORRECTNESS_r09.json
    "doc_classifier_kappa",  # CORRECTNESS_r04.json
    "doc_cms_token_counts",  # CORRECTNESS_r09.json
    "doc_containment_pairs",  # CORRECTNESS_r04.json
    "doc_diverse_subset_mis",  # CORRECTNESS_r10.json
    "doc_dup_substring_coverage",  # CORRECTNESS_r09.json
    "doc_fingerprints",  # CORRECTNESS_r01.json
    "doc_gopher_quality",  # CORRECTNESS_r09.json
    "doc_hashed_features",  # CORRECTNESS_r04.json
    "doc_heavy_hitters_mg",  # CORRECTNESS_r09.json
    "doc_html_boilerplate_strip",  # CORRECTNESS_r04.json
    "doc_hybrid_rrf",  # CORRECTNESS_r10.json
    "doc_importance_sample",  # CORRECTNESS_r09.json
    "doc_inverted_index",  # CORRECTNESS_r09.json
    "doc_kcore_decomposition",  # CORRECTNESS_r10.json
    "doc_kneser_ney_lm",  # CORRECTNESS_r10.json
    "doc_label_propagation",  # CORRECTNESS_r10.json
    "doc_lang_id",  # CORRECTNESS_r01.json
    "doc_nb_calibration",  # CORRECTNESS_r04.json
    "doc_nb_lang_classify",  # CORRECTNESS_r04.json
    "doc_nb_margin_auc",  # CORRECTNESS_r04.json
    "doc_paragraph_dedup",  # CORRECTNESS_r09.json
    "doc_phrase_search",  # CORRECTNESS_r04.json
    "doc_pii_scrub",  # CORRECTNESS_r09.json
    "doc_preference_pairs",  # CORRECTNESS_r04.json
    "doc_quality_scores",  # CORRECTNESS_r01.json
    "doc_rake_keyphrases",  # CORRECTNESS_r10.json
    "doc_rougel_pairs",  # CORRECTNESS_r04.json
    "doc_simhash_sort_locality",  # CORRECTNESS_r04.json
    "doc_span_corruption",  # CORRECTNESS_r09.json
    "doc_stratified_sample",  # CORRECTNESS_r04.json
    "doc_tfidf_top_terms",  # CORRECTNESS_r09.json
    "doc_token_class_pmi",  # CORRECTNESS_r09.json
    "doc_token_runs",  # CORRECTNESS_r09.json
    "doc_token_stats",  # CORRECTNESS_r01.json
    "doc_tokenizer_fertility",  # CORRECTNESS_r10.json
    "doc_top_tokens",  # CORRECTNESS_r09.json
    "doc_trigram_search",  # CORRECTNESS_r09.json
    "doc_unicode_nfc",  # CORRECTNESS_r04.json
    "doc_vocab_encode",  # CORRECTNESS_r09.json
    "doc_warc_roundtrip",  # CORRECTNESS_r10.json
    "doc_winnowing_fingerprints",  # CORRECTNESS_r04.json
    "doc_word_eigencentrality",  # CORRECTNESS_r10.json
    "embedding_near_dup",  # CORRECTNESS_r01.json
    "embeddings_bitext_mining",  # CORRECTNESS_r04.json
    "embeddings_bitext_mining_srp",  # CORRECTNESS_r05.json
    "embeddings_dbscan",  # CORRECTNESS_r05.json
    "embeddings_hard_negatives",  # CORRECTNESS_r05.json
    "embeddings_int8_quantization",  # CORRECTNESS_r05.json
    "embeddings_jl_projection",  # CORRECTNESS_r05.json
    "embeddings_knn_classify",  # CORRECTNESS_r04.json
    "embeddings_label_centroids",  # CORRECTNESS_r04.json
    "embeddings_matryoshka_eval",  # CORRECTNESS_r04.json
    "embeddings_mmr_rerank",  # CORRECTNESS_r05.json
    "embeddings_pca_power_iteration",  # CORRECTNESS_r05.json
    "embeddings_pca_two_components",  # CORRECTNESS_r05.json
    "embeddings_pq_code_dedup",  # CORRECTNESS_r05.json
    "embeddings_pq_codebooks",  # CORRECTNESS_r04.json
    "events_ab_conversion_ztest",  # CORRECTNESS_r07.json
    "events_ab_srm_check",  # CORRECTNESS_r06.json
    "events_asof_last_click",  # CORRECTNESS_r01.json
    "events_capture_recapture",  # CORRECTNESS_r06.json
    "events_chain_ladder",  # CORRECTNESS_r06.json, CORRECTNESS_r08.json
    "events_churn_labels",  # CORRECTNESS_r05.json
    "events_cohort_ltv",  # CORRECTNESS_r06.json
    "events_cohort_retention",  # CORRECTNESS_r05.json
    "events_cross_correlation",  # CORRECTNESS_r05.json
    "events_cumulative_unique_users",  # CORRECTNESS_r05.json
    "events_cuped_adjustment",  # CORRECTNESS_r06.json
    "events_cusum_changepoint",  # CORRECTNESS_r06.json
    "events_debounce",  # CORRECTNESS_r06.json
    "events_dynamic_session_gaps",  # CORRECTNESS_r06.json
    "events_ewma_smoothing",  # CORRECTNESS_r05.json
    "events_frequent_sequences",  # CORRECTNESS_r06.json
    "events_funnel_time_to_convert",  # CORRECTNESS_r06.json
    "events_gap_fill_lerp",  # CORRECTNESS_r06.json
    "events_gap_fill_locf",  # CORRECTNESS_r05.json
    "events_hll_distinct",  # CORRECTNESS_r05.json
    "events_hll_mergeable_groups",  # CORRECTNESS_r05.json
    "events_hll_set_operations",  # CORRECTNESS_r06.json
    "events_holt_forecast",  # CORRECTNESS_r06.json
    "events_holt_winters_forecast",  # CORRECTNESS_r06.json
    "events_hopping_window",  # CORRECTNESS_r05.json
    "events_hourly_autocorrelation",  # CORRECTNESS_r09.json
    "events_hourly_by_type",  # CORRECTNESS_r01.json
    "events_interval_join",  # CORRECTNESS_r06.json
    "events_json_corrupt_capture",  # CORRECTNESS_r06.json
    "events_json_props",  # CORRECTNESS_r05.json
    "events_kaplan_meier",  # CORRECTNESS_r06.json
    "events_kll_by_type",  # CORRECTNESS_r05.json
    "events_kmv_distinct",  # CORRECTNESS_r05.json
    "events_ks_two_sample",  # CORRECTNESS_r06.json
    "events_local_hour_report",  # CORRECTNESS_r06.json
    "events_max_drawdown",  # CORRECTNESS_r06.json
    "events_multi_rollup",  # CORRECTNESS_r01.json
    "events_partition_pruned_scan",  # CORRECTNESS_r05.json
    "events_peak_concurrency",  # CORRECTNESS_r05.json
    "events_per_user_capped_sample",  # CORRECTNESS_r05.json
    "events_pmi_cooccurrence",  # CORRECTNESS_r06.json
    "events_position_attribution",  # CORRECTNESS_r05.json
    "events_process_durations",  # CORRECTNESS_r06.json
    "events_range_correlation",  # CORRECTNESS_r01.json
    "events_rolling_wau",  # CORRECTNESS_r05.json
    "events_rollup_cascade",  # CORRECTNESS_r05.json
    "events_rollup_incremental_refresh",  # CORRECTNESS_r05.json
    "events_seasonal_anomaly",  # CORRECTNESS_r05.json
    "events_seasonal_naive_backtest",  # CORRECTNESS_r06.json
    "events_segmented_regression",  # CORRECTNESS_r06.json
    "events_session_funnel",  # CORRECTNESS_r05.json
    "events_session_patterns",  # CORRECTNESS_r05.json
    "events_sessionization",  # CORRECTNESS_r01.json
    "events_shapley_attribution",  # CORRECTNESS_r06.json
    "events_skew_salted_agg",  # CORRECTNESS_r10.json
    "events_skew_salted_join",  # CORRECTNESS_r10.json
    "events_slo_burn_rate",  # CORRECTNESS_r06.json
    "events_sprt_monitor",  # CORRECTNESS_r06.json
    "events_sprt_sequential_test",  # CORRECTNESS_r06.json, CORRECTNESS_r08.json
    "events_stateful_user_totals",  # CORRECTNESS_r05.json
    "events_stl_lite_decomposition",  # CORRECTNESS_r06.json
    "events_stream_dedup_watermark",  # CORRECTNESS_r05.json
    "events_stream_static_join",  # CORRECTNESS_r05.json
    "events_stream_stream_full_join",  # CORRECTNESS_r06.json
    "events_stream_stream_join",  # CORRECTNESS_r05.json
    "events_stream_stream_left_join",  # CORRECTNESS_r05.json
    "events_streaming_dedup",  # CORRECTNESS_r05.json
    "events_streaming_dedup_sessions",  # CORRECTNESS_r06.json
    "events_streaming_hll_state",  # CORRECTNESS_r06.json
    "events_streaming_kll_state",  # CORRECTNESS_r05.json
    "events_streaming_late_drop",  # CORRECTNESS_r06.json
    "events_streaming_sessions",  # CORRECTNESS_r05.json
    "events_streaming_state_ttl",  # CORRECTNESS_r07.json
    "events_temporal_split",  # CORRECTNESS_r05.json
    "events_time_weighted_value",  # CORRECTNESS_r05.json
    "events_trailing_hour_window",  # CORRECTNESS_r05.json
    "events_transition_matrix",  # CORRECTNESS_r07.json
    "events_user_robust_outliers",  # CORRECTNESS_r05.json
    "events_user_running_stats",  # CORRECTNESS_r01.json
    "events_variant_props",  # CORRECTNESS_r05.json
    "events_viterbi_decode",  # CORRECTNESS_r06.json
    "events_wow_change_report",  # CORRECTNESS_r06.json
    "fact_compensating_entries",  # CORRECTNESS_r02.json
    "fact_join_view_incremental",  # CORRECTNESS_r02.json
    "fact_late_dimension",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "fact_order_lifecycle",  # CORRECTNESS_r02.json
    "fact_period_end_balance",  # CORRECTNESS_r02.json
    "fact_sales_by_brand_year",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "fx_arbitrage_detection",  # CORRECTNESS_r09.json
    "khachhang_csv_pipeline",  # CORRECTNESS_r01.json
    "khachhang_golden_records",  # CORRECTNESS_r06.json
    "lineitem_als_recommend",  # CORRECTNESS_r09.json
    "lineitem_bradley_terry",  # CORRECTNESS_r08.json
    "lineitem_bt_calibration",  # CORRECTNESS_r08.json
    "lineitem_cms_selfjoin_size",  # CORRECTNESS_r09.json
    "lineitem_correlation_matrix",  # CORRECTNESS_r07.json
    "lineitem_key_skew_profile",  # CORRECTNESS_r07.json
    "lineitem_ols_regression",  # CORRECTNESS_r07.json
    "lineitem_price_indexes",  # CORRECTNESS_r09.json
    "lineitem_zonemap_pruning",  # CORRECTNESS_r08.json
    "merged_customer_sources",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "mon_csv_quality",  # CORRECTNESS_r06.json
    "mon_dual_source_merge",  # CORRECTNESS_r01.json
    "monitoring_compaction_plan",  # CORRECTNESS_r08.json
    "monitoring_entity_summary",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "monitoring_file_stats",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "multimodal_aiff_decode",  # CORRECTNESS_r04.json
    "multimodal_arrow_features",  # CORRECTNESS_r04.json
    "multimodal_audio_frames",  # CORRECTNESS_r04.json
    "multimodal_audio_near_dup",  # CORRECTNESS_r04.json
    "multimodal_audio_resample",  # CORRECTNESS_r04.json
    "multimodal_avi_keyframes",  # CORRECTNESS_r04.json
    "multimodal_features",  # CORRECTNESS_r01.json
    "multimodal_flac_decode",  # CORRECTNESS_r04.json
    "multimodal_frame_sample",  # CORRECTNESS_r04.json
    "multimodal_gif_decode",  # CORRECTNESS_r04.json
    "multimodal_image_near_dup",  # CORRECTNESS_r04.json
    "multimodal_jpeg_decode",  # CORRECTNESS_r04.json
    "multimodal_png_decode",  # CORRECTNESS_r04.json
    "multimodal_ppm_decode",  # CORRECTNESS_r04.json
    "multimodal_resize",  # CORRECTNESS_r04.json
    "multimodal_tga_decode",  # CORRECTNESS_r04.json
    "multimodal_video_near_dup",  # CORRECTNESS_r04.json
    "multimodal_wav_decode",  # CORRECTNESS_r04.json
    "nations_dtw_profiles",  # CORRECTNESS_r08.json
    "nations_shortest_paths",  # CORRECTNESS_r08.json
    "nations_trade_pagerank",  # CORRECTNESS_r07.json
    "nguyenlieu_csv_quality",  # CORRECTNESS_r06.json
    "nguyenlieu_inventory_fact",  # CORRECTNESS_r01.json
    "order_line_value",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "orders_aqp_sample_estimate",  # CORRECTNESS_r09.json
    "orders_avro_roundtrip",  # CORRECTNESS_r08.json
    "orders_avro_schema_evolution",  # CORRECTNESS_r09.json
    "orders_benford_leading_digit",  # CORRECTNESS_r07.json
    "orders_bitmap_index_scan",  # CORRECTNESS_r08.json
    "orders_bloom_semi_join",  # CORRECTNESS_r07.json
    "orders_bucketed_colocated_join",  # CORRECTNESS_r07.json
    "orders_cdc_apply",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "orders_change_contribution",  # CORRECTNESS_r08.json
    "orders_chisq_segment_status",  # CORRECTNESS_r07.json
    "orders_column_checksums",  # CORRECTNESS_r07.json
    "orders_conformal_intervals",  # CORRECTNESS_r08.json
    "orders_constraint_suite",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "orders_cube",  # CORRECTNESS_r08.json
    "orders_daily_spine",  # CORRECTNESS_r02.json
    "orders_decision_stump",  # CORRECTNESS_r07.json
    "orders_diff_in_diff",  # CORRECTNESS_r08.json
    "orders_dp_noisy_counts",  # CORRECTNESS_r03.json
    "orders_dynamic_partition_pruning",  # CORRECTNESS_r06.json
    "orders_encoding_advisor",  # CORRECTNESS_r08.json
    "orders_fd_discovery",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "orders_first_wins_dedup",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "orders_format_parity_audit",  # CORRECTNESS_r09.json
    "orders_fx_normalized",  # CORRECTNESS_r02.json
    "orders_group_relative_advantage",  # CORRECTNESS_r09.json
    "orders_grouped_agg_median",  # CORRECTNESS_r05.json
    "orders_grouping_sets",  # CORRECTNESS_r06.json
    "orders_hhi_concentration",  # CORRECTNESS_r09.json
    "orders_isotonic_calibration",  # CORRECTNESS_r09.json
    "orders_kll_quantiles",  # CORRECTNESS_r08.json
    "orders_kmv_set_algebra",  # CORRECTNESS_r07.json
    "orders_mann_whitney",  # CORRECTNESS_r08.json
    "orders_matched_att",  # CORRECTNESS_r08.json
    "orders_merkle_root",  # CORRECTNESS_r09.json
    "orders_multipass_quantiles",  # CORRECTNESS_r07.json
    "orders_negative_sampling",  # CORRECTNESS_r07.json
    "orders_nested_lines",  # CORRECTNESS_r07.json
    "orders_neyman_allocation",  # CORRECTNESS_r08.json
    "orders_observed_metrics",  # CORRECTNESS_r07.json
    "orders_orc_roundtrip",  # CORRECTNESS_r08.json
    "orders_pass_at_k",  # CORRECTNESS_r09.json
    "orders_pipe_syntax",  # CORRECTNESS_r07.json
    "orders_pit_dimension_join",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "orders_pivot_status",  # CORRECTNESS_r06.json
    "orders_point_in_polygon",  # CORRECTNESS_r09.json
    "orders_poisson_bootstrap",  # CORRECTNESS_r07.json
    "orders_price_histogram",  # CORRECTNESS_r06.json
    "orders_price_percentile_disc",  # CORRECTNESS_r06.json
    "orders_price_quantiles",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "orders_priority_sample",  # CORRECTNESS_r08.json
    "orders_protobuf_roundtrip",  # CORRECTNESS_r08.json
    "orders_psi_drift",  # CORRECTNESS_r07.json
    "orders_python_datasink",  # CORRECTNESS_r08.json
    "orders_quantile_buckets",  # CORRECTNESS_r07.json
    "orders_quantile_sketch",  # CORRECTNESS_r08.json
    "orders_queue_capacity_plan",  # CORRECTNESS_r09.json
    "orders_queue_simulation",  # CORRECTNESS_r09.json
    "orders_range_partition_hist",  # CORRECTNESS_r07.json
    "orders_rebate_proration",  # CORRECTNESS_r07.json
    "orders_schema_evolution_read",  # CORRECTNESS_r03.json
    "orders_segment_welch_tests",  # CORRECTNESS_r08.json
    "orders_sql_script_cutoff",  # CORRECTNESS_r08.json
    "orders_sqlite_cdc_stream",  # CORRECTNESS_r09.json
    "orders_sqlite_partial_load",  # CORRECTNESS_r08.json
    "orders_sqlite_roundtrip",  # CORRECTNESS_r08.json
    "orders_status_report",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "orders_streaming_online_logreg",  # CORRECTNESS_r06.json
    "orders_target_encoding_loo",  # CORRECTNESS_r03.json
    "orders_theil_sen_slope",  # CORRECTNESS_r08.json
    "orders_top3_per_customer",  # CORRECTNESS_r07.json
    "orders_unpivot_measures",  # CORRECTNESS_r06.json
    "orders_window_rank_suite",  # CORRECTNESS_r07.json
    "orders_winsorized_stats",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "orders_with_late_lines",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "orders_xml_roundtrip",  # CORRECTNESS_r08.json
    "orders_zone_diff",  # CORRECTNESS_r07.json
    "orders_zorder_layout",  # CORRECTNESS_r07.json
    "part_category_lookup",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "parts_abc_classification",  # CORRECTNESS_r07.json
    "parts_also_bought_topk",  # CORRECTNESS_r08.json
    "parts_decayed_popularity",  # CORRECTNESS_r08.json
    "parts_eoq_inventory_policy",  # CORRECTNESS_r09.json
    "parts_market_basket",  # CORRECTNESS_r07.json
    "parts_price_elasticity",  # CORRECTNESS_r08.json
    "parts_price_volume_mix",  # CORRECTNESS_r08.json
    "parts_recsys_eval",  # CORRECTNESS_r08.json
    "parts_skyline_2d",  # CORRECTNESS_r08.json
    "parts_triangle_count",  # CORRECTNESS_r07.json
    "parts_triangle_estimate",  # CORRECTNESS_r07.json
    "partsupp_fifo_allocation",  # CORRECTNESS_r10.json
    "pipeline_run_history",  # CORRECTNESS_r06.json
    "q10_returned_items",  # CORRECTNESS_r10.json
    "q11_important_stock",  # CORRECTNESS_r10.json
    "q12_late_priority_split",  # CORRECTNESS_r10.json
    "q13_order_count_distribution",  # CORRECTNESS_r10.json
    "q14_promotion_effect",  # CORRECTNESS_r07.json
    "q15_top_supplier",  # CORRECTNESS_r10.json
    "q16_supplier_part_counts",  # CORRECTNESS_r10.json
    "q17_small_quantity_revenue",  # CORRECTNESS_r10.json
    "q18_large_volume_customer",  # CORRECTNESS_r07.json
    "q19_disjunctive_revenue",  # CORRECTNESS_r10.json
    "q1_pricing_summary",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "q20_volume_suppliers",  # CORRECTNESS_r10.json
    "q21_waiting_suppliers",  # CORRECTNESS_r10.json
    "q22_sales_opportunity",  # CORRECTNESS_r10.json
    "q2_min_cost_supplier",  # CORRECTNESS_r10.json
    "q3_shipping_priority",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "q4_order_priority",  # CORRECTNESS_r10.json
    "q5_local_supplier_volume",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "q6_forecast_revenue",  # CORRECTNESS_r10.json
    "q7_volume_shipping",  # CORRECTNESS_r07.json
    "q8_market_share",  # CORRECTNESS_r10.json
    "q9_product_profit",  # CORRECTNESS_r10.json
    "reconcile_conflicts",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "reconcile_not_in_null_keys",  # CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "reconcile_only_in_source",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json
    "sensors_pushdown_scan",  # CORRECTNESS_r07.json
    "sensors_python_datasource",  # CORRECTNESS_r07.json
    "sensors_sqlite_stream_sink",  # CORRECTNESS_r08.json
    "sensors_streaming_sink",  # CORRECTNESS_r08.json
    "sensors_streaming_source",  # CORRECTNESS_r07.json
    "sqlite_catalog_discovery",  # CORRECTNESS_r08.json
    "star_revenue_by_region",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "streaming_inbox_pipeline",  # CORRECTNESS_r01.json, CORRECTNESS_r03.json
    "streaming_manifest_sink",  # CORRECTNESS_r05.json
    "streaming_neardup_ingest",  # CORRECTNESS_r05.json
    "streaming_neardup_store_growth",  # CORRECTNESS_r06.json
    "supplier_balance_by_nation",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "suppliers_geo_radius_join",  # CORRECTNESS_r09.json
    "table_row_counts",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
    "top10_orders",  # CORRECTNESS_r01.json, CORRECTNESS_r02.json, CORRECTNESS_r03.json, CORRECTNESS_r10.json
})

# Names whose LATEST driver sampling was red (any *_match false or
# an error): the catalog puts these FIRST — ahead even of
# never-sampled names — so every fix is re-validated by the very
# next round's ~50-query prefix instead of waiting out the
# rotation (VERDICT r7 items 1 and 5).
DRIVER_RED_LATEST: frozenset[str] = frozenset({
})
