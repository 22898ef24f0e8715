"""Aggregate module: importing this populates the full query registry.

Registration order matters: the correctness driver walks ``queries()`` in
order under a fixed budget (rounds 1 and 2 each covered exactly the first 50
entries of their round's ordering). To convert builder-claimed coverage into
driver-proven coverage we emit, in order: (a) the round-2 red/err rows whose
fixes land this round (oracle-dtype CASTs, golden-VALUES oracles for the
approximate queries), (b) every never-driver-sampled query (the llm_ops2
block, quality gates, dedup_clusters, contamination, pack/sample/shuffle,
relational4/5 leftovers), then (c) the 96 queries already green in
CORRECTNESS_r01/r02 last — they are the least informative to re-check if the
budget runs out.
"""

from . import relational  # noqa: F401
from . import relational2  # noqa: F401
from . import relational3  # noqa: F401
from . import relational4  # noqa: F401
from . import relational5  # noqa: F401
from . import streaming_ops  # noqa: F401

try:  # LLM-pipeline ops land in a later milestone of each round
    from . import llm_ops  # noqa: F401
    from . import llm_ops2  # noqa: F401
    from . import llm_ops3  # noqa: F401
    from . import llm_ops4  # noqa: F401
    from . import llm_ops5  # noqa: F401
    from . import llm_ops6  # noqa: F401
    from . import llm_ops7  # noqa: F401
    from . import llm_ops8  # noqa: F401
    from . import llm_ops9  # noqa: F401
    from . import llm_ops10  # noqa: F401
    from . import llm_ops11  # noqa: F401
except ImportError:
    pass

from .registry import QUERIES, oracle_sql, queries  # noqa: F401

#: Queries with a green driver row in CORRECTNESS_r01.json — re-verified
#: last. Everything NOT in this list has never been independently checked
#: by the driver and goes first.
_R01_DRIVER_VERIFIED: tuple[str, ...] = (
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "q18_large_orders",
    "join_broadcast_part_brand", "join_left_outer_order_counts",
    "join_semi_customers_with_f_orders", "join_anti_customers_without_orders",
    "agg_distinct_suppliers_per_flag", "agg_rollup_flag_status",
    "agg_cube_priority_status", "window_rank_orders_per_customer",
    "window_running_sum_user_value", "window_lag_value_delta",
    "sort_limit_top_orders", "set_intersect_nations", "set_except_nations",
    "set_union_distinct_keys", "scalar_string_functions",
    "scalar_date_functions", "scalar_math_functions", "case_when_price_bands",
    "json_extract_event_props", "q4_order_priority", "q7_volume_shipping",
    "q14_promo_revenue", "q15_top_supplier", "q2_min_cost_supplier",
    "agg_variance_exact", "agg_min_max_by", "agg_array_collect_sorted",
    "pivot_status_by_priority", "window_rank_variants",
    "window_first_last_frames", "window_range_interval",
    "scalar_hash_functions", "scalar_string_functions2",
    "scalar_date_functions2", "scalar_conditional_functions",
    "scalar_bitwise_ops", "limit_offset_pagination",
    "q13_customer_distribution", "q19_disjunctive_predicate",
    "q22_waiting_customers", "q8_market_share", "q9_product_profit",
    "agg_grouping_sets", "agg_multi_distinct",
)

#: Queries with a green driver row in CORRECTNESS_r02.json — also demoted.
#: Deliberately EXCLUDED from this list (they must be re-sampled in round 3):
#: ``curation_hash_split`` (r02 hash_match=false — oracle dtype bug, fixed by
#: CAST(SUM(..) AS BIGINT)) and ``similarity_ann_lsh`` / ``similarity_ann_ivf``
#: / ``multimodal_features`` (r02 err=no_oracle — golden-VALUES oracles added
#: in round 3).
_R02_DRIVER_VERIFIED: tuple[str, ...] = (
    "q12_shipmode_priority", "q17_small_quantity_revenue",
    "q20_potential_promotion_suppliers", "q21_waiting_multi_supplier",
    "q11_important_stock", "q16_supplier_part_counts",
    "window_hypertable_rollup", "envelope_project", "seek_timestamp",
    "rewind_at_seqno", "assign_shard", "shard_round_robin",
    "shard_pseudo_random", "consumer_group_round_robin", "latest_vs_earliest",
    "xrange_bounded_scan", "relay_filtered_copy", "stream_merge_order_fuse",
    "stream_join_correlate", "window_tumbling_1h", "window_sliding_1h_30m",
    "window_session_30m", "dedup_events_first_per_key",
    "stream_merge_sharded", "stdio_line_roundtrip", "ss_file_decode",
    "asof_join_purchase_click", "range_join_click_window",
    "asof_join_forward_next_click", "redis_stream_roundtrip",
    "ss_write_roundtrip", "iggy_stream_roundtrip", "text_token_stats",
    "text_quality_score", "text_lang_id", "text_fingerprint", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_simhash_neardup", "similarity_cosine_topk", "similarity_knn_join",
    "similarity_near_dup", "multimodal_decode_stub",
    "multimodal_frame_sample",
)

#: Queries with a green driver row in CORRECTNESS_r03.json (50/50 green,
#: including all round-2 red/err resamples) — demoted to re-verification.
_R03_DRIVER_VERIFIED: tuple[str, ...] = (
    "curation_hash_split", "similarity_ann_lsh", "similarity_ann_ivf",
    "multimodal_features", "agg_approx_sketches", "curation_pack_chunks",
    "curation_mixture_resample", "redis_group_pending_summary",
    "redis_group_autoclaim_failover", "kafka_txn_visibility",
    "redis_wire_roundtrip", "similarity_ann_lsh_banded",
    "similarity_ann_ivf_pq", "similarity_ann_pq", "curation_stratified_sample",
    "curation_shuffle_order", "text_ngram_counts", "curation_contamination",
    "quality_gopher_flags", "text_repetition_stats", "pii_redaction",
    "text_bpe_token_count", "curation_source_cap", "dedup_clusters",
    "sessionize_events", "text_zipf_ranks", "hybrid_search_rerank",
    "multimodal_ppm_roundtrip", "multimodal_png_roundtrip", "search_bm25_topk",
    "text_tfidf_topterms", "curation_chunk_overlap", "dedup_semantic_ivf",
    "multimodal_jpeg_roundtrip", "multimodal_wav_features",
    "multimodal_mjpeg_frames", "multimodal_gif_frames", "agg_percentile_cont",
    "agg_corr_exact", "array_lambda_functions", "array_explode_stats",
    "regexp_functions", "in_subquery_segment", "values_inline_dim_join",
    "agg_having_filter", "unpivot_part_measures", "generate_sequence_explode",
    "sort_nulls_ordering", "set_except_all_multiset",
    "set_intersect_all_multiset",
)


#: Round-4 front of the line: every query with tri-scale local proof but
#: ZERO driver rows — the round-2/round-3 post-budget waves, promoted per
#: the round-3 re-rank TODO (and VERDICT.md r3 "Next round" #1). 62 entries
#: at a 50-slot budget: slots 1-50 got rows in round 4 (all green, now in
#: ``_R04_DRIVER_VERIFIED`` below); the 12-entry tail is the round-5 front.
#: Order preserved from registration.
_POST_BUDGET: tuple[str, ...] = (
    "dedup_span_coverage", "dedup_bloom_incremental", "quality_char_lm",
    "embedding_whiten_project", "sketch_heavy_hitters",
    "events_anomaly_zscore", "curation_dsir_select",
    "graph_neardup_pagerank", "tokenizer_bpe_counts",
    "curation_leakage_safe_split", "layout_zorder_events",
    "profile_documents", "triples_hard_negatives",
    "contamination_matrix_sources", "sketch_hll_per_source",
    "sketch_kmv_jaccard_sources", "text_normalize_stats",
    "text_lang_id_ngram", "sketch_quantile_bottomk", "join_skew_salted",
    "dataset_snapshot_diff", "multimodal_dhash_neardup", "text_typo_pairs",
    "events_funnel_stages", "profile_incremental_merge",
    "multimodal_audio_neardup", "join_bloom_prefilter", "events_value_trend",
    "embedding_quantize_sq8", "dedup_crossmodal_agreement",
    "join_point_in_time",
    # round-3 official-session wave (same post-budget treatment)
    "text_html_extract", "web_url_stats", "text_line_dedup",
    "cdc_merge_upsert", "tokenizer_wordpiece_counts",
    "quality_classifier_probe", "entity_resolution_customers",
    "events_cohort_retention", "profile_key_skew",
    "dedup_clusters_incremental", "mmr_diverse_topk",
    "events_pattern_match", "events_gapfill_15m",
    "validate_expectations", "sketch_join_cardinality",
    "profile_drift_chisq", "graph_triangle_counts", "privacy_k_anonymity",
    "dedup_span_removal", "search_rrf_fusion",
    "rollup_incremental_restatement", "profile_equiheight_histogram",
    "events_mad_outliers", "events_ab_conversion", "quality_rank_normalize",
    "scalar_collection_functions", "graph_bfs_levels",
    "scalar_struct_functions", "text_token_lift", "text_novelty_score",
    "corpus_growth_curve",
)


#: Queries with a green driver row in CORRECTNESS_r04.json (50/50 green,
#: all first-time samples — the first 50 of ``_POST_BUDGET``). Demoted so
#: the 12-entry ``_POST_BUDGET`` tail lands in driver slots 1-12 this round.
_R04_DRIVER_VERIFIED: tuple[str, ...] = (
    "dedup_span_coverage", "dedup_bloom_incremental", "quality_char_lm",
    "embedding_whiten_project", "sketch_heavy_hitters",
    "events_anomaly_zscore", "curation_dsir_select",
    "graph_neardup_pagerank", "tokenizer_bpe_counts",
    "curation_leakage_safe_split", "layout_zorder_events",
    "profile_documents", "triples_hard_negatives",
    "contamination_matrix_sources", "sketch_hll_per_source",
    "sketch_kmv_jaccard_sources", "text_normalize_stats",
    "text_lang_id_ngram", "sketch_quantile_bottomk", "join_skew_salted",
    "dataset_snapshot_diff", "multimodal_dhash_neardup", "text_typo_pairs",
    "events_funnel_stages", "profile_incremental_merge",
    "multimodal_audio_neardup", "join_bloom_prefilter", "events_value_trend",
    "embedding_quantize_sq8", "dedup_crossmodal_agreement",
    "join_point_in_time", "text_html_extract", "web_url_stats",
    "text_line_dedup", "cdc_merge_upsert", "tokenizer_wordpiece_counts",
    "quality_classifier_probe", "entity_resolution_customers",
    "events_cohort_retention", "profile_key_skew",
    "dedup_clusters_incremental", "mmr_diverse_topk", "events_pattern_match",
    "events_gapfill_15m", "validate_expectations", "sketch_join_cardinality",
    "profile_drift_chisq", "graph_triangle_counts", "privacy_k_anonymity",
    "dedup_span_removal",
)


#: Queries with a green driver row in CORRECTNESS_r05.json (50/50 green,
#: all first-time samples: the 12-entry ``_POST_BUDGET`` tail plus 38 of
#: the 48 round-5 registrations). Demoted to rank 5 so the 10 remaining
#: never-sampled queries (the post-window llm_ops8 waves 10-13) occupy
#: driver slots 1-10 this round. Driver-row order preserved.
_R05_DRIVER_VERIFIED: tuple[str, ...] = (
    "search_rrf_fusion", "rollup_incremental_restatement",
    "profile_equiheight_histogram", "events_mad_outliers",
    "events_ab_conversion", "quality_rank_normalize",
    "scalar_collection_functions", "graph_bfs_levels",
    "scalar_struct_functions", "text_token_lift", "text_novelty_score",
    "corpus_growth_curve", "envelope_wide_seqno", "asof_join_nearest_click",
    "similarity_ann_recall_eval", "dedup_threshold_sweep",
    "similarity_truncated_recall_eval", "dedup_span_coverage_salted",
    "events_decayed_engagement", "quality_winsorize",
    "events_rolling_7d_actives", "privacy_l_diversity",
    "events_transition_matrix", "agg_mode_exact",
    "dedup_keep_longest_per_cluster", "dedup_rate_by_source",
    "embedding_outlier_centroid", "events_last_touch_attribution",
    "dedup_cluster_size_histogram", "curation_token_budget_mixture",
    "events_rfm_segments", "text_containment_pairs", "cdc_scd2_history",
    "basket_brand_pair_lift", "similarity_knn_label_accuracy",
    "embedding_exact_dup_vectors", "events_sessions_bounce_rate",
    "events_interarrival_histogram", "curation_pii_rate_by_source",
    "orders_pareto_concentration", "search_snippet_highlight",
    "agg_gini_by_nation", "asof_join_tolerance_15m",
    "dedup_token_savings_by_source", "events_weekday_hour_heatmap",
    "dedup_lsh_recall_eval", "events_error_burst_detect",
    "profile_length_by_lang", "text_langid_confusion", "agg_hhi_by_nation",
)


#: HISTORICAL RECORD ONLY (r7 ADVICE: dead code since the round-7 re-rank).
#: Round-6 front of the line: the registry queries that had zero driver
#: rows after r1-r5. All 10 were driver-verified green in round 6 and now
#: live in ``_R06_DRIVER_VERIFIED`` (its first 10 entries); ``_rank`` no
#: longer references this tuple and future re-rank edits must not
#: resurrect it — it documents WHY those 10 lead the r6 tuple.
_NEVER_SAMPLED_FRONT: tuple[str, ...] = (
    "curation_lang_upsample_plan", "embedding_dim_variance_audit",
    "curation_dedup_pipeline_summary", "events_day_over_day_growth",
    "orders_seasonality_index", "quality_gopher_rate_by_source",
    "curation_source_lang_crosstab", "events_user_activity_histogram",
    "events_longest_daily_streak", "events_locf_imputation",
)


#: Queries with a green driver row in CORRECTNESS_r06.json (50/50 green:
#: the 10-entry never-sampled front, all 13 round-6 registrations, and 27
#: r1-era re-verifications). Driver-row order preserved. A query listed
#: here AND in an older tuple (the 27 re-verified r1 rows) ranks by its
#: LATEST evidence — ``_rank`` checks r6 first.
_R06_DRIVER_VERIFIED: tuple[str, ...] = (
    "curation_lang_upsample_plan", "embedding_dim_variance_audit",
    "curation_dedup_pipeline_summary", "events_day_over_day_growth",
    "orders_seasonality_index", "quality_gopher_rate_by_source",
    "curation_source_lang_crosstab", "events_user_activity_histogram",
    "events_longest_daily_streak", "events_locf_imputation",
    "dedup_exact_substring_spans", "dedup_span_removal_exact",
    "events_dau_mau_stickiness", "events_cumulative_new_users",
    "orders_ship_latency_histogram", "customer_spend_quartiles",
    "graph_kcore_peel", "curation_quality_weighted_sample",
    "dedup_minhash_estimate_error", "embedding_centroid_shift_by_label",
    "text_vocab_coverage_topn", "events_weekday_seasonality_residual",
    "part_brand_price_index", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue",
    "q10_returned_items", "q18_large_orders", "join_broadcast_part_brand",
    "join_left_outer_order_counts", "join_semi_customers_with_f_orders",
    "join_anti_customers_without_orders",
    "agg_distinct_suppliers_per_flag", "agg_rollup_flag_status",
    "agg_cube_priority_status", "window_rank_orders_per_customer",
    "window_running_sum_user_value", "window_lag_value_delta",
    "sort_limit_top_orders", "set_intersect_nations", "set_except_nations",
    "set_union_distinct_keys", "scalar_string_functions",
    "scalar_date_functions", "scalar_math_functions",
    "case_when_price_bands", "json_extract_event_props",
    "q4_order_priority", "q7_volume_shipping",
)


#: Queries with a green driver row in CORRECTNESS_r07.json (50/50 green:
#: both round-7 registrations, the 23 r1-latest rows the r7 re-rank put
#: in front, and 25 of the 45 r2-latest rows). Driver-row order
#: preserved. A query listed here AND in an older tuple ranks by its
#: LATEST evidence — ``_rank`` checks r7 first.
_R07_DRIVER_VERIFIED: tuple[str, ...] = (
    "quality_perplexity_buckets", "curation_eval_decontaminate",
    "q14_promo_revenue", "q15_top_supplier", "q2_min_cost_supplier",
    "agg_variance_exact", "agg_min_max_by", "agg_array_collect_sorted",
    "pivot_status_by_priority", "window_rank_variants",
    "window_first_last_frames", "window_range_interval",
    "scalar_hash_functions", "scalar_string_functions2",
    "scalar_date_functions2", "scalar_conditional_functions",
    "scalar_bitwise_ops", "limit_offset_pagination",
    "q13_customer_distribution", "q19_disjunctive_predicate",
    "q22_waiting_customers", "q8_market_share", "q9_product_profit",
    "agg_grouping_sets", "agg_multi_distinct", "q12_shipmode_priority",
    "q17_small_quantity_revenue", "q20_potential_promotion_suppliers",
    "q21_waiting_multi_supplier", "q11_important_stock",
    "q16_supplier_part_counts", "window_hypertable_rollup",
    "envelope_project", "seek_timestamp", "rewind_at_seqno",
    "assign_shard", "shard_round_robin", "shard_pseudo_random",
    "consumer_group_round_robin", "latest_vs_earliest",
    "xrange_bounded_scan", "relay_filtered_copy",
    "stream_merge_order_fuse", "stream_join_correlate",
    "window_tumbling_1h", "window_sliding_1h_30m", "window_session_30m",
    "dedup_events_first_per_key", "stream_merge_sharded",
    "stdio_line_roundtrip",
)


def _rank(item: tuple[str, object]) -> tuple[float, int]:
    """Round-8 ordering (VERDICT r7 "Next round" #5).

    Rank -1 (driver slots first): every round-8 registration — nothing
    in any ``_R0x_DRIVER_VERIFIED`` tuple — in module-import
    registration order (the sort is stable). Behind them:
    re-verification by LATEST driver evidence, oldest first. Tuples are
    checked newest-round-first so a query re-verified in r7 ranks 7
    even if it also appears in the r1/r2 tuple. After r7 the stale set
    is exactly **21 r2-latest + 50 r3-latest** rows (computed from the
    r1-r7 CORRECTNESS union; zero r1-latest remain — r7 cleared them.
    The r6 docstring's "~34 r2-latest" was a miscount, r7 VERDICT
    "What's wrong" #3). The ~50-slot budget = new r8 registrations +
    all 21 r2 rows + the oldest r3 rows. Red/err rows would stay out of
    their round's tuple (so they rank by their previous green, or -1 if
    never green) and re-sample early; r7 had none (50/50 green).
    """
    name = item[0]
    if name in _R07_DRIVER_VERIFIED:
        return (7, _R07_DRIVER_VERIFIED.index(name))
    if name in _R06_DRIVER_VERIFIED:
        return (6, _R06_DRIVER_VERIFIED.index(name))
    if name in _R05_DRIVER_VERIFIED:
        return (5, _R05_DRIVER_VERIFIED.index(name))
    if name in _R04_DRIVER_VERIFIED:
        return (4, _R04_DRIVER_VERIFIED.index(name))
    if name in _R03_DRIVER_VERIFIED:
        return (3, _R03_DRIVER_VERIFIED.index(name))
    if name in _R02_DRIVER_VERIFIED:
        return (2, _R02_DRIVER_VERIFIED.index(name))
    if name in _R01_DRIVER_VERIFIED:
        return (1, _R01_DRIVER_VERIFIED.index(name))
    # Never driver-sampled: round-8 additions land at the very front.
    return (-1, 0)


_ordered = sorted(QUERIES.items(), key=_rank)
_snapshot = dict(_ordered)
QUERIES.clear()
QUERIES.update(_snapshot)

# ---------------------------------------------------------------------------
# ROUND-9 RE-RANK TODO (the move rounds 4-8 all executed): when
# CORRECTNESS_r08.json lands, append its green rows to a new
# ``_R08_DRIVER_VERIFIED`` tuple ranked 8 in ``_rank`` (red/err rows stay
# un-demoted so they re-sample immediately) and keep re-verification
# oldest-latest-evidence-first. Expected post-r8 stale floor: 0 r2-latest
# (round 8's budget covers all 21) and ~(50 - 21 - n_new_r8) of the
# 50 r3-latest rows re-verified; recompute the exact count from the
# CORRECTNESS union rather than trusting this comment (r7's "~34" was a
# miscount the judge flagged).
