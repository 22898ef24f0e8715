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

#: Round-3 must-sample set: the r02 red/err rows whose fixes land this round.
#: Ahead of everything so they get driver rows under any budget cut.
_PRIORITY_RESAMPLE: tuple[str, ...] = (
    "curation_hash_split", "similarity_ann_lsh", "similarity_ann_ivf",
    "multimodal_features", "agg_approx_sketches",
    "curation_pack_chunks", "curation_mixture_resample",
)


#: Registered AFTER the round-3 driver-budget window was frozen: ranked
#: right behind the 50-query backlog (positions 51+), so the driver's
#: budget still covers the backlog exactly; these get rows next round (or
#: this round, if the budget turns out to exceed 50 — they pass the same
#: strict local sweep as everything else).
#:
#: ROUND-4 RE-RANK TODO (first thing next round, after reading
#: CORRECTNESS_r03): append round-3's green names to a new
#: _R03_DRIVER_VERIFIED demotion list and promote THIS bucket to the
#: front (all 50 entries — the round-2 continuation waves AND the round-3
#: official-session wave — have tri-scale local proof but zero driver
#: rows; at 50 per round the driver needs two more rounds to cover them,
#: so keep the never-sampled ones ahead of re-verification), plus any
#: round-3 red/err rows with fixes. All entries here also pass the sf0.1
#: sweep, so only driver sampling is outstanding.
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


def _rank(item: tuple[str, object]) -> tuple[float, int]:
    name = item[0]
    if name in _PRIORITY_RESAMPLE:
        return (-1, _PRIORITY_RESAMPLE.index(name))
    if name in _POST_BUDGET:
        return (2.5, _POST_BUDGET.index(name))
    if name in _R01_DRIVER_VERIFIED:
        return (3, _R01_DRIVER_VERIFIED.index(name))
    if name in _R02_DRIVER_VERIFIED:
        return (4, _R02_DRIVER_VERIFIED.index(name))
    # Never driver-sampled: streaming + LLM blocks keep their relative
    # registration order but move ahead of relational leftovers.
    qd = QUERIES[name]
    if any(t in ("streaming", "llm") for t in qd.tags) or name in _STREAMING_LLM:
        return (0, 0)
    return (2, 0)


# Tag metadata is sparse; classify by defining module instead.
_STREAMING_LLM = {
    n for n, qd in QUERIES.items()
    if getattr(qd.fn, "__module__", "").rsplit(".", 1)[-1]
    in (
        "streaming_ops", "llm_ops", "llm_ops2", "llm_ops3", "llm_ops4",
        "llm_ops5", "llm_ops6",
    )
}

_ordered = sorted(QUERIES.items(), key=_rank)
_snapshot = dict(_ordered)
QUERIES.clear()
QUERIES.update(_snapshot)
