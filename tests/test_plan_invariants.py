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
    "e_cms_user_counts",     # 1-row N-total scalar broadcast (tolerance bound)
}


# ---------------------------------------------------------------------------
# Coarse-partition window lint (round-8 VERDICT #2): a Window whose
# PARTITION BY resolves entirely to bounded-cardinality fixture columns
# hashes every input row onto <= prod(cardinalities) reducers — fine over
# an aggregate-sized frame, a scale-killer over a row-sized one (the
# r_mann_whitney round-7 finding, generalized). The lint walks the
# OPTIMIZED LOGICAL plan: for each Window it resolves the partition
# attributes through Project aliases back to source columns, and if every
# one is bounded it follows the first-child spine below the Window — a
# row-reducing op (Aggregate/Distinct/Limit) before the leaf relation
# means the frame is aggregate-sized (pass); reaching the relation with
# no reduction means the window sorts raw rows on a handful of reducers
# (flag). Routed queries pass because their windows partition on
# (group, quantile-bucket) — the bucket column is not a bounded fixture
# column.
# ---------------------------------------------------------------------------

# known-bounded fixture columns -> distinct-count (from TESTDATA.md
# schemas; these cardinalities are data-model facts, not sf-dependent)
BOUNDED_FIXTURE_COLS = {
    "o_orderpriority": 5,
    "o_orderstatus": 3,
    "l_returnflag": 3,
    "l_linestatus": 2,
    "l_shipmode": 7,
    "l_shipinstruct": 4,
    "r_name": 5,
    "r_regionkey": 5,
    "n_name": 25,
    "n_nationkey": 25,
    "n_regionkey": 5,
    "c_mktsegment": 5,
    "p_mfgr": 5,
    "p_brand": 25,
    "event_type": 5,
    "lang": 5,
    "source": 20,
    "label": 10,
    "kind": 3,
}
MAX_BOUNDED_PRODUCT = 200

_ROW_REDUCING = (
    "Aggregate", "Distinct", "Deduplicate", "GlobalLimit", "LocalLimit",
    "Intersect", "Except",
    # a rank-filter window compiles to WindowGroupLimit: the partial
    # per-group top-k below the exchange bounds the sorted frame at
    # groups x k x partitions rows — the v_grouped_knn shape
    "WindowGroupLimit",
    # Arrow-UDF nodes are opaque: the lint cannot prove the frame is
    # row-sized through them (e.g. grouped_cap_sample's stage-1 prune
    # BOUNDS its output at groups x n per task) — stop, don't flag
    "MapInPandas", "FlatMapGroupsInPandas", "MapInArrow",
    "FlatMapCoGroupsInPandas", "PythonMapInArrow",
)
_LEAVES = (
    "Relation", "LocalRelation", "LogicalRDD", "OneRowRelation", "Range",
    "ExternalRDD", "Scan",
)

import re  # noqa: E402


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-"))


def _op_name(line: str) -> str:
    stripped = line.lstrip(" :+-")
    return stripped.split(" ", 1)[0].split("[", 1)[0]


def coarse_window_violations(optimized_plan: str) -> list[str]:
    """Window nodes partitioned ONLY on bounded-cardinality fixture
    columns over a row-sized (never-aggregated) frame. Returns one
    descriptive string per violation (empty = clean)."""
    lines = optimized_plan.splitlines()
    # global alias map: exprId -> source attribute name (or None when the
    # alias is a computed expression — unresolvable, treated unbounded)
    alias_src: dict[str, str | None] = {}
    # every alias target is unresolvable by default; a second pass marks
    # the pure attribute-rename cases (`col#1 AS alias#2`) resolvable
    for m in re.finditer(r" AS (\w+)#(\d+)", optimized_plan):
        alias_src.setdefault(m.group(2), None)
    for m in re.finditer(
        r"[\[\(, ](\w+)#(\d+)L? AS (\w+)#(\d+)", optimized_plan
    ):
        alias_src[m.group(4)] = m.group(1) + "#" + m.group(2)

    def resolve(name: str, eid: str, depth: int = 0) -> str | None:
        """Follow alias chains to a source column NAME (or None)."""
        if depth > 8:
            return None
        if name in BOUNDED_FIXTURE_COLS:
            return name
        src = alias_src.get(eid)
        if src is None:
            return None
        sm = re.fullmatch(r"(\w+)#(\d+)", src)
        return resolve(sm.group(1), sm.group(2), depth + 1) if sm else None

    out = []
    for i, line in enumerate(lines):
        if _op_name(line) != "Window":
            continue
        pm = re.search(r"\], \[([^\]]*)\], \[[^\]]*\]\s*$", line)
        if not pm or not pm.group(1).strip():
            continue  # empty partition = global window, a different lint
        part_cols = re.findall(r"(\w+)#(\d+)", pm.group(1))
        resolved = [resolve(n, e) for n, e in part_cols]
        if any(r is None for r in resolved):
            continue  # at least one unbounded/unknown partition column
        product = 1
        for r in resolved:
            product *= BOUNDED_FIXTURE_COLS[r]
        if product > MAX_BOUNDED_PRODUCT:
            continue
        # first-child spine walk below the Window
        base = _indent(line)
        verdict = "row-sized"
        for nxt in lines[i + 1 :]:
            if _indent(nxt) <= base:
                break
            op = _op_name(nxt)
            if op in _ROW_REDUCING:
                verdict = "reduced"
                break
            if any(op.startswith(leaf) for leaf in _LEAVES):
                break
            base = _indent(nxt)
        if verdict == "row-sized":
            out.append(
                f"Window partitioned on {sorted(set(resolved))} "
                f"(<= {product} reducers) over a row-sized frame"
            )
    return out


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_coarse_window_lint_discriminates(spark, sf_dir):
    """The lint itself must (a) flag a deliberately-wrong per-priority
    rank over raw orders — including through an alias — and (b) pass the
    same window once the frame is aggregate-sized."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bad = o.select(
        F.col("o_orderpriority").alias("grp"), "o_totalprice"
    ).withColumn(
        "r",
        F.rank().over(Window.partitionBy("grp").orderBy("o_totalprice")),
    )
    assert coarse_window_violations(_optimized(bad)), _optimized(bad)

    agg = o.groupBy("o_orderpriority", "o_orderdate").agg(
        F.sum("o_totalprice").alias("s")
    )
    ok = agg.withColumn(
        "cs",
        F.sum("s").over(
            Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
        ),
    )
    assert coarse_window_violations(_optimized(ok)) == []

    # high-cardinality co-partition key disarms the bound
    fine = o.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("o_orderpriority", "o_custkey").orderBy(
                "o_totalprice"
            )
        ),
    )
    assert coarse_window_violations(_optimized(fine)) == []


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


def test_registry_no_coarse_group_windows_at_scale(spark, sf_dir):
    """The 100-TB question the lint asks is about the plan a query would
    run AT SCALE, so every registry plan is built with the dimension-
    window routing threshold forced to zero (the branch a huge frame
    takes) before linting: a query whose scale-mode plan still windows
    raw rows on a bounded-cardinality partition key is a genuine
    scale-killer (the round-7 r_mann_whitney finding, now structural).
    Fixture-size plans legitimately take the plain-window branch — they
    are NOT linted, exactly because the routing exists."""
    from vectordb_similarity_search_spark.operators import ranking
    from vectordb_similarity_search_spark.plans.catalog import (
        clear_plan_cache,
    )

    offenders = []
    orig = ranking.DIMENSION_WINDOW_MAX_BYTES
    ranking.DIMENSION_WINDOW_MAX_BYTES = -1
    # builders are memoized per (session, sf_dir, query); the patched
    # threshold only reaches a FRESH build — clear going in, and clear
    # again on the way out so scale-mode plans don't leak to later tests
    clear_plan_cache()
    try:
        for name, spec in REGISTRY.items():
            hits = coarse_window_violations(_optimized(spec.fn(spark, sf_dir)))
            if hits:
                offenders.append(f"{name}: {hits}")
    finally:
        ranking.DIMENSION_WINDOW_MAX_BYTES = orig
        clear_plan_cache()
    assert not offenders, offenders
