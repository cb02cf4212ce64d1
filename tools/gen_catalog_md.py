"""Regenerate CATALOG.md from the query catalog.

Grouping lives in FAMILIES below; any entry not listed lands in "Other"
(and is printed to stderr so it gets filed). Run from the repo root:

    python tools/gen_catalog_md.py
"""

from __future__ import annotations

import sys

from overseer_spark.queries.catalog import CATALOG

FAMILIES: dict[str, list[str]] = {
    "Scans, filters, projections": [
        "q01_scan_count", "q02_projection_filter", "q03_string_filter",
        "q04_conjunctive_filter", "q05_in_list", "q06_like",
        "pyds_docs_scan", "layout_pruning_probe", "layout_zorder_buckets",
        "q_csv_roundtrip",
        "q_jsonl_roundtrip", "q_gzip_jsonl_roundtrip", "q_orc_roundtrip",
    ],
    "Joins": [
        "q07_inner_join", "q08_multiway_join", "q09_left_join", "q10_semi_join",
        "q11_anti_join", "q12_theta_self_join", "q_full_outer_join",
        "q_right_outer_join", "asof_join_events", "interval_join_events", "q_point_in_time_join",
        "q_null_safe_join", "bloom_semi_join_prune", "q_fuzzy_match_levenshtein",
        "er_match_pairs", "er_match_clusters", "q_geo_nearby_pairs",
    ],
    "Aggregation & grouping": [
        "q13_global_agg", "q14_grouped_agg", "q15_count_distinct", "q16_distinct",
        "q17_having", "q18_rollup", "q19_case_decode", "q_cube", "q_grouping_sets",
        "q_median_percentiles", "q_stats_aggs", "q_conditional_agg", "q_min_max_by",
        "q_multi_distinct_agg", "q_value_histogram", "q_equi_depth_histogram",
        "q_string_agg",
        "q_incremental_merge", "q_topk_per_group_agg", "q_snapshot_diff_cdc",
        "q_percent_of_total", "q_abc_analysis", "q_pivot_status", "q_unpivot_melt",
        "q_rfm_segments", "q_basket_pairs",
        "q_cohort_retention", "time_rollup_hierarchy", "q_data_profile",
        "q_integrity_audit", "dq_expectations_report", "q_dataset_manifest",
        "q_outlier_counts", "q_mad_outliers",
        "q_join_key_skew_profile",
        "q_json_props_sum", "skew_salted_agg", "pandas_udaf_weighted_mean",
        "q_mixture_plan", "zscore_groups", "q_date_spine", "q_winsorized_stats",
        "q_time_weighted_avg", "q_ab_test_stats", "q_decimal_exact_money",
        "q_regression_metrics", "q_bitmask_funnel", "q_k_anonymity", "q_t_closeness", "q_l_diversity", "q_id_gap_audit", "q_impute_median_by_group",
        "q_rolling_active_users", "q_weighted_median", "q_gini_coefficient",
        "q_skyline_pareto", "q_churn_features", "q_decayed_score",
        "q_observed_metrics", "q_benford_audit", "q_seasonal_baseline",
        "q_seasonal_anomaly_flags", "q_changepoint_cusum", "q_psi_drift",
        "q_diff_in_diff", "q_survival_km", "q_auc_rank", "q_entropy_by_user",
        "q_forecast_backtest_mape", "q_dp_noisy_counts",
    ],
    "Windows & sequences": [
        "q20_rank_window", "q21_lag_window", "q22_frame_window", "q23_topk",
        "q_rank_variants", "q_window_extras", "q_lead_nth_window",
        "q_range_frame_window", "q_sequence_islands", "q_forward_fill",
        "q_loo_mean", "ewma_user_value", "q_rolling_regression_slope",
        "q_event_transitions", "q_user_journeys", "q_dau_growth",
        "q_cumulative_distinct_users",
        "q_global_sort",
        "q_drop_duplicates_keyed", "funnel_view_click_purchase",
        "q_funnel_conversion_latency", "q_markov_attribution",
        "q_scd2_intervals", "q_cumulative_max_drawdown", "q_resample_interpolate",
        "q_interval_merge", "q_peak_concurrency", "q_sequential_patterns",
        "q_active_learning_batch",
    ],
    "Streaming (event-time)": [
        "q30_tumbling_window", "sliding_window_counts", "sessionize", "q_session_stats",
        "stream_hourly_counts", "stream_sessionize", "stream_dedup_counts",
        "stream_sliding_counts", "stream_running_totals",
        "stream_static_join_counts", "stream_incr_dedup_screen",
        "stream_stream_join_pairs", "stream_dedup_within_watermark", "stream_store_transitions",
        "stream_warc_ingest", "stream_blocklist_counts",
        "stream_chat_format_audit", "stream_quality_gate",
    ],
    "Set ops & subqueries": [
        "q24_union_all", "q25_intersect", "q26_except", "q_union_distinct",
        "q_union_by_name_evolution", "q_scalar_subquery", "q_exists_correlated",
        "q_not_in_null_semantics", "q_lateral_topn_per_key",
        "q_null_semantics_matrix",
    ],
    "Scalar functions & types": [
        "q27_string_funcs", "q28_datetime_funcs", "q29_math_funcs", "q_date_arith",
        "q_regexp_extract", "q_map_ops", "q36_json_extract", "q_variant_json",
        "q37_array_l2norm", "q_explode_outer_semantics", "udtf_tokenize_positions",
        "pandas_udf_scalar", "q_sql_function_surface", "q_array_functions_surface",
        "udtf_zip_explode_dynamic", "q_xml_roundtrip", "udtf_table_arg_topk",
        "q_try_arithmetic",
    ],
    "Engine tables (scheduler queries)": [
        "q31_ready_set", "q32_dead_set", "q33_transitive_closure",
        "q33b_closure_recursive_cte", "q33c_closure_sql_scripting", "q_status_counts", "dag_degree_stats",
        "dag_topo_levels", "dag_pagerank", "dag_components", "dag_cycle_check",
        "graph_triangle_count", "graph_kcore", "graph_lpa_communities",
        "graph_modularity",
        "dag_critical_path",
        "store_time_travel", "store_manifest_time_travel",
        "store_sqlite_fsm_trace", "dag_slack_analysis",
    ],
    "Dedup family": [
        "q35_exact_dup_count", "dedup_exact_groups", "dedup_golden_record",
        "dedup_rate_by_source", "text_soft_dedup_weights",
        "minhash_near_dup_pairs", "simhash_signatures", "simhash_near_dup_pairs",
        "ngram_jaccard_pairs", "ngram_containment_pairs", "near_dup_components", "near_dup_dedup_count",
        "embedding_near_dup_exact", "text_dup_span_stats",
        "semantic_dedup_clustered",
        "incr_exact_survivor_count", "incr_exact_flagged",
        "incr_near_dup_vs_corpus", "incr_dedup_survivor_ids",
        "incr_exact_substr_vs_corpus",
        "minhash_recall_eval", "text_paragraph_dedup_stats",
        "text_exact_substr_spans", "dedup_lsh_param_plan",
    ],
    "Similarity & embeddings": [
        "q38_cosine_top5", "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_topk",
        "ann_ivf_index_topk", "ann_lsh_index_topk", "ann_ivfpq_topk",
        "ann_ivfpq_index_topk",
        "knn_label_predict",
        "embedding_centroids", "embedding_quantize_int8", "kmeans_assign_step",
        "embedding_pca_power", "kmeans_lloyd_iters",
        "ann_pq_topk", "ann_pq_rerank_topk", "embedding_mmr_topk",
        "ann_recall_eval", "hybrid_retrieval_overlap",
        "embedding_sign_bits", "ann_hamming_topk", "ann_hamming_recall_eval",
        "ann_graph_topk", "ann_graph_recall_eval", "ann_ivf_index_append",
        "ann_ivf_index_delete", "ann_ivf_index_compact",
        "ann_ivf_index_upsert",
        "ann_graph_index_topk", "ann_graph_ooc_topk",
        "ann_graph_ooc_recall_eval", "ann_graph_ooc_index_topk",
        "ann_graph_index_lifecycle", "stream_ann_ingest",
        "ann_graph_bucketed_index_topk", "stream_graph_ann_ingest",
        "hybrid_rrf_fusion_topk", "hard_negative_mining",
        "hard_negative_mining_ann", "retrieval_ndcg_eval",
        "embedding_dimension_stats", "embedding_outlier_flags",
        "embedding_matryoshka_eval", "embedding_knn_graph",
        "embedding_centroid_drift", "embedding_cluster_medoids",
    ],
    "Text analysis": [
        "q34_lang_stats", "text_token_count", "text_quality",
        "text_quality_filter_count", "text_normalize", "text_fingerprint_md5",
        "text_fingerprint_rolling", "text_language_id", "text_top_terms",
        "text_top_terms_per_lang", "text_doc_freq_idf", "text_repetition_ratio",
        "text_redact_pii", "text_chunk_overlap", "text_contamination_check",
        "text_bm25_search", "text_ngram_counts", "text_zipf_slope",
        "text_vocab_overlap", "text_dsir_scores", "text_chi2_terms",
        "text_perplexity_unigram", "text_ccnet_buckets",
        "quality_classifier_score", "text_kwic_snippets",
        "text_gopher_rules", "text_gopher_reject_stats", "docs_quality_ensemble",
        "text_remove_repeated_spans", "text_bpe_token_stats",
        "text_heavy_hitters", "text_bigram_pmi", "text_span_corruption",
        "text_perplexity_bigram", "q_cohens_kappa",
        "text_js_divergence_by_source", "text_lid_confusion_eval",
        "text_compression_ratio", "text_html_extract",
        "url_normalize_dedup", "warc_extract_pipeline", "url_robots_filter",
        "text_markdown_extract", "text_blocklist_ac",
        "text_ngram_novelty", "prefix_cache_groups",
        "text_readability_scores", "quality_filter_bias_audit",
        "text_bpe_merge_train", "text_bpe_train_apply",
        "text_bpe_encode_from_artifact", "quality_score_calibration",
    ],
    "Multimodal": [
        "multimodal_meta", "multimodal_frame_sample", "multimodal_dedup_bytes",
        "multimodal_decode_features", "multimodal_audio_spectral",
        "multimodal_image_ahash", "multimodal_audio_fingerprint",
        "multimodal_resize_thumbnails", "multimodal_audio_vad",
        "multimodal_scene_cuts", "multimodal_image_near_dup",
        "multimodal_image_dedup_count", "multimodal_png_decode", "multimodal_jpeg_decode",
        "multimodal_gif_scene_cuts", "multimodal_progressive_decode",
        "multimodal_mp4_scene_cuts", "multimodal_flac_decode",
    ],
    "Pipeline composites & packing": [
        "train_prep_pipeline", "pack_sequences", "train_test_split_counts",
        "stratified_sample_counts", "stratified_fixed_k_sample", "r13_seeded_sample",
        "deterministic_shuffle_order", "weighted_sample_by_length",
        "contrastive_pairs_mining", "preference_pairs", "shard_plan_by_tokens",
        "q_group_kfold_split", "text_fim_transform", "text_instruction_format",
        "mixture_unimax_plan", "length_bucket_batches",
        "text_tokenizer_fertility", "semantic_doc_order",
        "chat_format_audit", "rl_rejection_sampling",
        "mixture_epoch_expansion",
        "mixture_temperature_weights", "mixture_temperature_expansion",
        "packing_efficiency_sweep",
        "chat_loss_masking_stats", "curriculum_phase_plan",
        "quality_threshold_sweep", "quality_gate_by_source",

        "source_cap_downsample", "near_dup_keep_best",
    ],
    "Sketches & approximation": [
        "q42_approx_aggs", "hll_distinct_merge", "cms_term_counts",
        "hll_intersection_estimate", "q_rolling_distinct_sketch",
        "q_bootstrap_ci",
    ],
    "TPC-H shapes": [
        "tpch_q1_full", "tpch_q2_shape", "tpch_q3_shape", "tpch_q4_shape", "tpch_q5_shape",
        "tpch_q6_shape", "tpch_q7_shape", "tpch_q8_shape", "tpch_q9_shape",
        "tpch_q10_shape", "tpch_q11_shape", "tpch_q12_shape", "tpch_q13_shape",
        "tpch_q14_shape",
        "tpch_q15_shape", "tpch_q16_shape", "tpch_q17_shape", "tpch_q18_shape",
        "tpch_q19_shape", "tpch_q20_shape", "tpch_q21_shape", "tpch_q22_shape",
    ],
}


def main() -> None:
    assigned: set[str] = set()
    out = [
        "# CATALOG — declared query/operator inventory\n\n"
        f"{len(CATALOG)} entries. SQL tier = DuckDB-oracle hash-matched at sf0.01; "
        "PY tier = Python/numpy pytest oracle (see tests/). "
        "Generated by tools/gen_catalog_md.py from overseer_spark/queries/catalog.py.\n"
    ]
    rest = [n for n in CATALOG if n not in {e for v in FAMILIES.values() for e in v}]
    for fam, names in list(FAMILIES.items()) + ([("Other", rest)] if rest else []):
        out.append(f"\n## {fam}\n\n| entry | tier | what it does |\n|---|---|---|\n")
        for n in names:
            if n not in CATALOG:
                print(f"warning: {n} in FAMILIES but not in CATALOG", file=sys.stderr)
                continue
            spec = CATALOG[n]
            doc = " ".join((spec.doc or "").split()).split(". ")[0][:140]
            tier = "SQL" if spec.oracle is not None else "PY"
            out.append(f"| `{n}` | {tier} | {doc} |\n")
            assigned.add(n)
    with open("CATALOG.md", "w") as f:
        f.write("".join(out))
    if rest:
        print(f"unfiled entries (landed in Other): {rest}", file=sys.stderr)
    print(f"CATALOG.md regenerated: {len(assigned)} entries filed")


if __name__ == "__main__":
    main()
