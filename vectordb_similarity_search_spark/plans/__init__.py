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

# ---------------------------------------------------------------------------
# Round-6 rotation (VERDICT r5 order #1 — executes the committed calendar):
# the 38 queries that have NEVER received a driver CORRECTNESS row (the 6
# round-5 late newcomers + the 32 analytics-battery members) plus 11 of the
# 12 stale r1/r2-era rows take the window; e_tumbling_hourly stays as the
# unchanged environment canary (the timestamp-normalization seam the r3
# NANOS->NTZ break hit). w_lead_gap_days spills to round 7 (the w family
# stays covered: w_percentile_rank is green in CORRECTNESS_r05). Round-6
# newcomers displace stale rows from the END of the window (r_date_funcs2
# first), never the never-checked block.
DRIVER_WINDOW = [
    "e_tumbling_hourly",
    "r_equidepth_histogram",
    "t_heldout_ppl",
    "r_entity_resolution",
    "v_adaptive_knn",
    "r_mutual_info",
    "e_forecast_baseline",
    "t_pmi_bigrams",
    "e_changepoint",
    "t_token_entropy",
    "e_power_analysis",
    "r_theil_index",
    "e_top_sequences",
    "e_cohort_ltv",
    "r_market_basket",
    "t_mixture_sample",
    "r_target_encoding",
    "v_hybrid_alpha",
    "e_ab_test",
    "e_markov_transitions",
    "e_gini_users",
    "t_chisq_lang_source",
    "e_audience_overlap",
    "t_readability_ari",
    "e_funnel_latency",
    "e_session_stats",
    "r_pareto_revenue",
    "e_seasonal_profile",
    "r_monthly_growth",
    "e_dau_wau",
    "t_ks_drift",
    "v_rp_distortion",
    "t_nb_calibration",
    "e_pit_features",
    "e_ewma_smooth",
    "r_benford",
    "t_keyword_tfidf",
    "r_k_anonymity",
    "r_dp_counts",
    "t_lang_guess_confusion",
    "r_string_funcs2",
    "v_store_stats",
    "v_zscore_fit",
    "v_query_cohort_stats",
    "v_centroids",
    "t_token_stats",
    "r_range_join",
    "r_hhi_concentration",
    "e_mad_outliers",
    "e_stream_audit",
]

# Past the driver's cap — every query here is re-verified on every test
# run by the local oracle replica (tests/test_oracle_parity.py).
TAIL = [
    # --- ROUND-6 late newcomers: first driver rows due in the round-7
    # window (local-replica green every pytest run meanwhile) -----------
    "t_kl_divergence",
    "r_survival_km",
    "r_bootstrap_ci",
    "t_bm25_incremental",
    "v_link_prediction",
    "e_conformal",
    "e_did",
    "w_streaks",
    "t_temperature_mixture",
    "r_lorenz_curve",
    "e_burstiness",
    "t_lang_outliers",
    "v_ood_centroid",
    "s_time_split",
    "r_ab_srm",
    "t_dedup_impact",
    "w_moving_median",
    # --- ROUND-7 spill: stale r1/r2 rows displaced by the 50-slot cap ---
    "w_lead_gap_days",
    "r_date_funcs2",
    "r_intersect_except",
    "t_ngram_jaccard_pairs",
    # --- round-5 window (all green in CORRECTNESS_r05) -------------------
    "d_ppjoin_pairs",
    "d_novelty_curve",
    "d_containment_pairs",
    "d_knn_components",
    "d_cross_decontaminate",
    "d_substring_spans",
    "d_banding_curve",
    "m_phash_neardup",
    "m_scene_detect",
    "m_audio_energy",
    "p_pca_variance",
    "r_als_recs",
    "r_pagerank",
    "r_triangle_count",
    "v_knn_graph",
    "v_ivfpq_knn",
    "e_cuped",
    "t_nb_crossval",
    "v_label_ndcg",
    "t_bm25_prf",
    "r_skyline",
    "r_rfm_segments",
    "s_sample_weighted",
    "s_group_sample",
    "s_cluster_split",
    "w_percentile_rank",
    "t_heavy_hitters",
    "t_token_shards",
    "t_line_dedup",
    "t_bm25_indexed",
    "v_bq_knn",
    "v_recall_matrix",
    "v_triplet_mining",
    "v_grouped_knn",
    "v_mrl_recall",
    "v_semantic_cache",
    "v_centroid_margin",
    "t_hashtf_knn",
    "r_snapshot_diff",
    "r_data_checks",
    "e_attribution",
    "e_funnel_conversion",
    "e_retention_cohorts",
    "r_winsorized_mean",
    "e_gapfill_locf",
    "r_fuzzy_name_pairs",
    "e_rolling_anomaly",
    "r_corr_matrix",
    "t_bpe_apply",
    # --- stable: latest driver row r3/r4 --------------------------------
    "s_sample_stratified",
    "v_ivf_knn_batch",
    "v_sq8_knn",
    "v_pq_knn",
    "v_filtered_knn",
    "v_range_search",
    "v_search_docs",
    "v_mmr_rerank",
    "v_ivf_knn_filtered",
    "t_nb_quality",
    "v_index_stats",
    "r_table_profile",
    "v_embedding_drift",
    "v_late_interaction",
    "r_pricing_summary",
    "r_market_revenue",
    "r_rollup_revenue",
    "t_exact_dedup",
    "t_bpe_train",
    "r_region_nation_revenue",
    "r_left_join_counts",
    "r_percentiles",
    "r_string_agg",
    "r_above_customer_avg",
    "r_anti_join",
    "r_semi_join",
    "v_knn_l2",
    "r_grouping_sets",
    "r_array_agg",
    "w_moving_avg",
    "v_embedding_variance",
    "v_dot_topk",
    "r_distinct_agg",
    "r_cube_orders",
    "r_conditional_stats",
    "r_case_buckets",
    "r_string_funcs",
    "r_date_funcs",
    "r_in_subquery",
    "r_union_parties",
    "r_scalar_math",
    "r_corr_stats",
    "r_having",
    "r_nested_agg",
    "r_first_last_window",
    "w_lag_delta",
    "w_running_sum",
    "w_share_of_customer",
    "t_quality_buckets",
    "v_knn_cosine",
    "v_sim_join_topk",
    "v_hybrid_rrf",
    "v_ivf_knn",
    "v_ivf_recall_curve",
    "v_lsh_knn",
    "r_skew_report",
    "r_approx_distinct",
    "w_rank_orders",
    "t_bm25_topk",
    "t_doclen_percentiles",
    "t_top_tokens",
    "t_idf_common",
    "t_stopword_ratio",
    "t_bpe_tokens",
    "t_fingerprint_pairs",
    "t_rep_ngram",
    "t_chunk_stats",
    "t_pack_sequences",
    "t_filter_funnel",
    "t_decontaminate",
    "t_phrase_stats",
    "t_scrub_pii",
    "t_zipf_slope",
    "t_bm25_phrase",
    "t_domain_mixture",
    "t_bigram_logprob",
    "e_sliding_2h",
    "e_session_windows",
    "e_json_extract",
    "e_asof_join",
    "e_interval_join",
    "e_pivot_user_activity",
    "e_from_json_filter",
    "e_hourly_top_type",
    "e_value_histogram",
    "d_embedding_neardup",
    "d_minhash_lsh_pairs",
    "d_simhash_pairs",
    "d_semantic_prune",
    "d_dedup_keep",
    "p_cohort_stats",
    "p_search_report",
    "m_embed_knn",
    "m_embed_knn_bn",
    "m_media_decode_stats",
    "m_frame_sample",
]


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
