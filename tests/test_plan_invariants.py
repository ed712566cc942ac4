"""Registry-WIDE physical-plan invariants — the 100 TB discipline,
enforced structurally instead of query-by-query:

- no ``BatchEvalPython`` anywhere: row-at-a-time Python UDFs are banned
  from every catalog path (Python appears only as Arrow-batched
  mapInPandas/applyInPandas, which print as ArrowEvalPython/MapInPandas
  nodes);
- no ``CartesianProduct`` anywhere: an unbounded non-broadcast cross
  join would be a scale-killer on any path;
- ``BroadcastNestedLoopJoin`` only where the broadcast side is a
  bounded scalar/stats frame (single-row totals, top-N rank lists,
  fraction tables) — the explicit whitelist below. A new query landing
  a BNLJ must either justify itself here (with the bounded side named)
  or restructure.

One sweep, one failure list — so a regression in any registered plan
(the sweep iterates the live REGISTRY; counts are derived, never
hard-coded) names every offender at once.
"""

from __future__ import annotations

from vectordb_similarity_search_spark.plans import REGISTRY

from .conftest import plan_of

# broadcast side is a bounded aggregate (grand totals, corpus stats,
# query-side top-N lists) — single-row or k-row, never corpus-sized
BNLJ_BOUNDED_BROADCAST = {
    "s_sample_stratified",   # per-stratum fraction table (strata-sized)
    "t_nb_quality",          # class prior row + vocab log-ratio totals
    "t_exact_dedup",         # grand-count row
    "v_triplet_mining",      # anchor-set rank bounds (k rows)
    "r_market_basket",       # item-count total row
    "r_target_encoding",     # global target mean row
    "r_intersect_except",    # branch-count rows
    "v_sim_join_topk",       # query-side top-k list
    "v_hybrid_rrf",          # two bounded top-N rank lists
    "v_hybrid_alpha",        # same two bounded top-50 lists + stats row
    "t_bm25_topk",           # corpus stats row (N, avgdl)
    "t_bm25_indexed",        # index meta row (N, avgdl) + per-term df row
    "t_bm25_incremental",    # same probe shape over the appended store
    "t_idf_common",          # doc-count row
    "t_keyword_tfidf",       # doc-count row (tf side is a bounded hash join)
    "t_bm25_phrase",         # corpus stats row
    "t_bigram_logprob",      # corpus token-total row
    "t_heldout_ppl",         # 1-row TRAIN-vocab total (t_bigram shape)
    "r_winsorized_mean",     # global p01/p99 percentile row
    "e_did",                 # 1-row day-range midpoint scalar broadcast
    "s_time_split",          # 1-row cut scalar + 1-row shared-user count
    "r_pareto_revenue",      # 3-row tier-percentage table
    "d_banding_curve",       # 1-row true-pair-count total + 4-row config table
    "v_rp_distortion",       # 40-row audit-subset non-equi self-join
    "t_nb_calibration",      # class prior row (same NB stack as t_nb_quality)
    "v_centroid_margin",     # |labels|-row centroid table broadcast
    "v_ood_centroid",        # same |labels|-row centroid broadcast
    "r_als_recs",            # 5 requested users' factor rows broadcast
    "t_hashtf_knn",          # query doc's norm: one scalar row broadcast
    "r_triangle_count",      # edge-count row + triangle-count row broadcast
    "v_label_ndcg",          # 20-row query-vector side broadcast (J2 shape)
    "e_power_analysis",      # 1-row stats x 3-row literal MDE cross
    "t_nb_crossval",         # vocab x 3-row literal fold cross
    "t_bm25_prf",            # corpus-stats row + fb-ids + term-frame broadcasts
}


def test_registry_plan_invariants(spark, sf_dir):
    offenders: dict[str, list[str]] = {
        "BatchEvalPython": [],
        "CartesianProduct": [],
        "BroadcastNestedLoopJoin": [],
    }
    for name, spec in REGISTRY.items():
        plan = plan_of(spec.fn(spark, sf_dir))
        if "BatchEvalPython" in plan:
            offenders["BatchEvalPython"].append(name)
        if "CartesianProduct" in plan:
            offenders["CartesianProduct"].append(name)
        if (
            "BroadcastNestedLoopJoin" in plan
            and name not in BNLJ_BOUNDED_BROADCAST
        ):
            offenders["BroadcastNestedLoopJoin"].append(name)
    assert not any(offenders.values()), offenders
