"""Named query catalog backing ``__spark_entry__.py``.

Importing this package registers every query module's entries into
``catalog.REGISTRY``.
"""

from . import catalog
from .catalog import REGISTRY, QuerySpec

# Register all query modules (import side-effect fills REGISTRY).
from . import vector_queries  # noqa: E402,F401
from . import relational_queries  # noqa: E402,F401
from . import window_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import event_queries  # noqa: E402,F401
from . import nonsql_queries  # noqa: E402,F401

# --- BEGIN GENERATED WINDOW (scripts/rotate_window.py --write) ---
# Regenerate with: python scripts/rotate_window.py --write
# (bump WINDOW_BUILT_FOR_ROUND first; the generator reads CORRECTNESS
# files of rounds strictly below it). tests/test_registry_order.py pins
# committed == generated for this marker.
WINDOW_BUILT_FOR_ROUND = 9

DRIVER_WINDOW = [
    "e_tumbling_hourly",  # last driver row r8
    "e_hh_rolling",  # never driver-checked
    "e_hh_rollup",  # never driver-checked
    "e_qsk_rolling_percentiles",  # never driver-checked
    "e_qsk_type_percentiles",  # never driver-checked
    "e_sample_aqp",  # never driver-checked
    "e_sketch_overlap",  # never driver-checked
    "e_stratified_aqp",  # never driver-checked
    "r_region_nation_revenue",  # last driver row r4
    "r_rollup_revenue",  # last driver row r4
    "r_scalar_math",  # last driver row r4
    "r_semi_join",  # last driver row r4
    "r_string_agg",  # last driver row r4
    "r_string_funcs",  # last driver row r4
    "r_table_profile",  # last driver row r4
    "r_union_parties",  # last driver row r4
    "t_bpe_train",  # last driver row r4
    "t_exact_dedup",  # last driver row r4
    "t_nb_quality",  # last driver row r4
    "t_quality_buckets",  # last driver row r4
    "v_dot_topk",  # last driver row r4
    "v_embedding_drift",  # last driver row r4
    "v_embedding_variance",  # last driver row r4
    "v_filtered_knn",  # last driver row r4
    "v_index_stats",  # last driver row r4
    "v_ivf_knn_batch",  # last driver row r4
    "v_ivf_knn_filtered",  # last driver row r4
    "v_knn_l2",  # last driver row r4
    "v_late_interaction",  # last driver row r4
    "v_mmr_rerank",  # last driver row r4
    "v_pq_knn",  # last driver row r4
    "v_range_search",  # last driver row r4
    "v_search_docs",  # last driver row r4
    "v_sq8_knn",  # last driver row r4
    "w_lag_delta",  # last driver row r4
    "w_moving_avg",  # last driver row r4
    "w_running_sum",  # last driver row r4
    "w_share_of_customer",  # last driver row r4
    "d_containment_pairs",  # last driver row r5
    "d_cross_decontaminate",  # last driver row r5
    "d_knn_components",  # last driver row r5
    "d_novelty_curve",  # last driver row r5
    "d_ppjoin_pairs",  # last driver row r5
    "d_substring_spans",  # last driver row r5
    "e_attribution",  # last driver row r5
    "e_cuped",  # last driver row r5
    "e_funnel_conversion",  # last driver row r5
    "s_cluster_split",  # last driver row r5
    "p_cohort_stats",  # last driver row r7
    "m_phash_neardup",  # last driver row r5
]

# Past the driver's 50-slot cap - every query here is re-verified on every
# test run by the local oracle replica (tests/test_oracle_parity.py).
TAIL = [
    "d_banding_curve",  # last driver row r8
    "e_cms_user_counts",  # last driver row r8
    "e_stream_sketch_audit",  # last driver row r8
    "m_audio_energy",  # last driver row r8
    "p_pca_variance",  # last driver row r8
    "r_above_customer_avg",  # last driver row r8
    "r_anti_join",  # last driver row r8
    "r_array_agg",  # last driver row r8
    "r_case_buckets",  # last driver row r8
    "r_conditional_stats",  # last driver row r8
    "r_corr_stats",  # last driver row r8
    "r_cube_orders",  # last driver row r8
    "r_date_funcs",  # last driver row r8
    "r_distinct_agg",  # last driver row r8
    "r_first_last_window",  # last driver row r8
    "r_grouping_sets",  # last driver row r8
    "r_having",  # last driver row r8
    "r_in_subquery",  # last driver row r8
    "r_left_join_counts",  # last driver row r8
    "r_market_revenue",  # last driver row r8
    "r_nested_agg",  # last driver row r8
    "r_percentiles",  # last driver row r8
    "r_pricing_summary",  # last driver row r8
    "s_sample_stratified",  # last driver row r8
    "t_bigram_logprob",  # last driver row r8
    "t_bm25_phrase",  # last driver row r8
    "t_bm25_topk",  # last driver row r8
    "t_bpe_tokens",  # last driver row r8
    "t_chunk_stats",  # last driver row r8
    "t_decontaminate",  # last driver row r8
    "t_doclen_percentiles",  # last driver row r8
    "t_domain_mixture",  # last driver row r8
    "t_filter_funnel",  # last driver row r8
    "t_fingerprint_pairs",  # last driver row r8
    "t_idf_common",  # last driver row r8
    "t_pack_sequences",  # last driver row r8
    "t_phrase_stats",  # last driver row r8
    "t_rep_ngram",  # last driver row r8
    "t_scrub_pii",  # last driver row r8
    "t_stopword_ratio",  # last driver row r8
    "t_top_tokens",  # last driver row r8
    "t_zipf_slope",  # last driver row r8
    "v_hybrid_rrf",  # last driver row r8
    "v_ivf_knn",  # last driver row r8
    "v_ivf_recall_curve",  # last driver row r8
    "v_knn_cosine",  # last driver row r8
    "v_lsh_knn",  # last driver row r8
    "v_sim_join_topk",  # last driver row r8
    "w_rank_orders",  # last driver row r8
    "d_dedup_keep",  # last driver row r7
    "d_embedding_neardup",  # last driver row r7
    "d_minhash_lsh_pairs",  # last driver row r7
    "d_semantic_prune",  # last driver row r7
    "d_simhash_pairs",  # last driver row r7
    "e_asof_join",  # last driver row r7
    "e_burstiness",  # last driver row r7
    "e_conformal",  # last driver row r7
    "e_did",  # last driver row r7
    "e_from_json_filter",  # last driver row r7
    "e_hll_rolling_by_type",  # last driver row r7
    "e_hll_rolling_users",  # last driver row r7
    "e_hll_type_rollup",  # last driver row r7
    "e_hourly_top_type",  # last driver row r7
    "e_interval_join",  # last driver row r7
    "e_json_extract",  # last driver row r7
    "e_new_users_curve",  # last driver row r7
    "e_pivot_user_activity",  # last driver row r7
    "e_session_windows",  # last driver row r7
    "e_sliding_2h",  # last driver row r7
    "e_value_histogram",  # last driver row r7
    "m_embed_knn",  # last driver row r7
    "m_embed_knn_bn",  # last driver row r7
    "m_frame_sample",  # last driver row r7
    "m_media_decode_stats",  # last driver row r7
    "m_wav_loudness",  # last driver row r7
    "p_search_report",  # last driver row r7
    "r_ab_srm",  # last driver row r7
    "r_approx_distinct",  # last driver row r7
    "r_bootstrap_ci",  # last driver row r7
    "r_date_funcs2",  # last driver row r7
    "r_intersect_except",  # last driver row r7
    "r_lorenz_curve",  # last driver row r7
    "r_mann_whitney",  # last driver row r7
    "r_skew_report",  # last driver row r7
    "r_survival_km",  # last driver row r7
    "s_time_split",  # last driver row r7
    "t_bm25_incremental",  # last driver row r7
    "t_dedup_impact",  # last driver row r7
    "t_kl_divergence",  # last driver row r7
    "t_lang_outliers",  # last driver row r7
    "t_ngram_jaccard_pairs",  # last driver row r7
    "t_temperature_mixture",  # last driver row r7
    "v_link_prediction",  # last driver row r7
    "v_ood_centroid",  # last driver row r7
    "w_lead_gap_days",  # last driver row r7
    "w_moving_median",  # last driver row r7
    "w_streaks",  # last driver row r7
    "e_ab_test",  # last driver row r6
    "e_audience_overlap",  # last driver row r6
    "e_changepoint",  # last driver row r6
    "e_cohort_ltv",  # last driver row r6
    "e_dau_wau",  # last driver row r6
    "e_ewma_smooth",  # last driver row r6
    "e_forecast_baseline",  # last driver row r6
    "e_funnel_latency",  # last driver row r6
    "e_gini_users",  # last driver row r6
    "e_mad_outliers",  # last driver row r6
    "e_markov_transitions",  # last driver row r6
    "e_pit_features",  # last driver row r6
    "e_power_analysis",  # last driver row r6
    "e_seasonal_profile",  # last driver row r6
    "e_session_stats",  # last driver row r6
    "e_stream_audit",  # last driver row r6
    "e_top_sequences",  # last driver row r6
    "r_benford",  # last driver row r6
    "r_dp_counts",  # last driver row r6
    "r_entity_resolution",  # last driver row r6
    "r_equidepth_histogram",  # last driver row r6
    "r_hhi_concentration",  # last driver row r6
    "r_k_anonymity",  # last driver row r6
    "r_market_basket",  # last driver row r6
    "r_monthly_growth",  # last driver row r6
    "r_mutual_info",  # last driver row r6
    "r_pareto_revenue",  # last driver row r6
    "r_range_join",  # last driver row r6
    "r_string_funcs2",  # last driver row r6
    "r_target_encoding",  # last driver row r6
    "r_theil_index",  # last driver row r6
    "t_chisq_lang_source",  # last driver row r6
    "t_heldout_ppl",  # last driver row r6
    "t_keyword_tfidf",  # last driver row r6
    "t_ks_drift",  # last driver row r6
    "t_lang_guess_confusion",  # last driver row r6
    "t_mixture_sample",  # last driver row r6
    "t_nb_calibration",  # last driver row r6
    "t_pmi_bigrams",  # last driver row r6
    "t_readability_ari",  # last driver row r6
    "t_token_entropy",  # last driver row r6
    "t_token_stats",  # last driver row r6
    "v_adaptive_knn",  # last driver row r6
    "v_centroids",  # last driver row r6
    "v_hybrid_alpha",  # last driver row r6
    "v_query_cohort_stats",  # last driver row r6
    "v_rp_distortion",  # last driver row r6
    "v_store_stats",  # last driver row r6
    "v_zscore_fit",  # last driver row r6
    "e_gapfill_locf",  # last driver row r5
    "e_retention_cohorts",  # last driver row r5
    "e_rolling_anomaly",  # last driver row r5
    "m_scene_detect",  # last driver row r5
    "r_als_recs",  # last driver row r5
    "r_corr_matrix",  # last driver row r5
    "r_data_checks",  # last driver row r5
    "r_fuzzy_name_pairs",  # last driver row r5
    "r_pagerank",  # last driver row r5
    "r_rfm_segments",  # last driver row r5
    "r_skyline",  # last driver row r5
    "r_snapshot_diff",  # last driver row r5
    "r_triangle_count",  # last driver row r5
    "r_winsorized_mean",  # last driver row r5
    "s_group_sample",  # last driver row r5
    "s_sample_weighted",  # last driver row r5
    "t_bm25_indexed",  # last driver row r5
    "t_bm25_prf",  # last driver row r5
    "t_bpe_apply",  # last driver row r5
    "t_hashtf_knn",  # last driver row r5
    "t_heavy_hitters",  # last driver row r5
    "t_line_dedup",  # last driver row r5
    "t_nb_crossval",  # last driver row r5
    "t_token_shards",  # last driver row r5
    "v_bq_knn",  # last driver row r5
    "v_centroid_margin",  # last driver row r5
    "v_grouped_knn",  # last driver row r5
    "v_ivfpq_knn",  # last driver row r5
    "v_knn_graph",  # last driver row r5
    "v_label_ndcg",  # last driver row r5
    "v_mrl_recall",  # last driver row r5
    "v_recall_matrix",  # last driver row r5
    "v_semantic_cache",  # last driver row r5
    "v_triplet_mining",  # last driver row r5
    "w_percentile_rank",  # last driver row r5
]
# --- END GENERATED WINDOW ---


def _reorder() -> None:
    order = [n for n in DRIVER_WINDOW + TAIL if n in REGISTRY]
    # lenient at import (the driver must never crash on a drift); the test
    # suite pins exact coverage.
    order += [n for n in REGISTRY if n not in order]
    seen: dict[str, QuerySpec] = {}
    for n in order:
        if n not in seen:
            seen[n] = REGISTRY[n]
    REGISTRY.clear()
    REGISTRY.update(seen)


_reorder()

__all__ = ["catalog", "REGISTRY", "QuerySpec", "DRIVER_WINDOW", "TAIL"]
