"""Filtered / radius / hydrated / MMR search — semantics and plan shapes.

These are the vector-DB serving-surface operators added in round 4
(operators/topk.py: filtered_knn, range_search, mmr_rerank and the
v_search_docs hydration query). Oracle parity covers values; these tests
pin the properties the oracles cannot see: pre-filter semantics, plan
shapes that survive a 100 TB corpus, and MMR's greedy guarantees.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.topk import (
    filtered_knn,
    knn,
    mmr_rerank,
    range_search,
)
from vectordb_similarity_search_spark.plans import REGISTRY
from vectordb_similarity_search_spark.sources.tables import load_table

from .conftest import plan_of




# ---------------------------------------------------------------- filtered


def test_filtered_knn_prefilter_semantics(spark, sf_dir):
    """PRE-filter: with an allow-list smaller than k the result is exactly
    the allow-listed rows (post-filtering top-k would return fewer)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).head()[1]
    allowed = emb.filter(F.col("vec_id").isin([7, 11, 13])).select("vec_id")
    out = filtered_knn(emb.filter(F.col("vec_id") != 0), qv, 10, allowed=allowed)
    assert sorted(r.vec_id for r in out.collect()) == [7, 11, 13]


def test_filtered_knn_predicate_pushes_to_scan(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).head()[1]
    out = filtered_knn(emb, qv, 5, predicate=F.col("label") == 1)
    plan = plan_of(out)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "label" in pushed[0]
    # still the two-phase top-k
    assert "TakeOrderedAndProject" in plan


def test_filtered_knn_matches_knn_on_prefiltered_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).head()[1]
    via_op = filtered_knn(emb, qv, 5, predicate=F.col("label") == 1).collect()
    via_manual = knn(emb.filter(F.col("label") == 1), qv, 5).collect()
    assert via_op == via_manual


def test_filtered_knn_requires_a_filter(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="predicate"):
        filtered_knn(emb, [0.0] * 8, 5)


def test_v_filtered_knn_plan_broadcast_semi_no_smj(spark, sf_dir):
    plan = plan_of(REGISTRY["v_filtered_knn"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------------------------ range


def test_range_search_matches_manual_filter(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).head()[1]
    got = {r.vec_id for r in range_search(emb, qv, 0.1).collect()}
    scored = knn(emb, qv, 10_000).collect()  # exhaustive, ordered
    want = {r.vec_id for r in scored if r.score is not None and r.score >= 0.1}
    assert got == want


def test_range_search_l2_keeps_below_threshold(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).head()[1]
    rows = range_search(emb, qv, 3.0, metric="l2", score_col="dist").collect()
    assert rows and all(r.dist <= 3.0 for r in rows)
    # self-match at distance 0 must be included
    assert 0 in {r.vec_id for r in rows}


def test_range_search_is_shuffle_free(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).head()[1]
    plan = plan_of(range_search(emb, qv, 0.2))
    assert "Exchange" not in plan  # narrow scan + filter, nothing else


# --------------------------------------------------------------- hydrated


def test_v_search_docs_broadcasts_hits_and_prunes_payload(spark, sf_dir):
    plan = plan_of(REGISTRY["v_search_docs"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the embeddings scan must not read the documents payload and the
    # documents scan must not read vectors
    schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    emb_scan = [s for s in schemas if "embedding" in s]
    doc_scan = [s for s in schemas if "text" in s]
    assert emb_scan and "text" not in emb_scan[0]
    assert doc_scan and "embedding" not in doc_scan[0]


# -------------------------------------------------------------------- MMR


def _candidates(spark, sf_dir, k=25):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).head()[1]
    return knn(emb.filter(F.col("vec_id") != 0), qv, k)


def test_mmr_first_pick_is_most_relevant(spark, sf_dir):
    cands = _candidates(spark, sf_dir)
    top_rel = cands.orderBy(F.desc("score"), "vec_id").head().vec_id
    out = mmr_rerank(cands, 5).orderBy("mmr_rank").collect()
    assert out[0].vec_id == top_rel
    assert [r.mmr_rank for r in out] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in out}) == 5  # no repeats


def test_mmr_lambda_one_is_relevance_order(spark, sf_dir):
    """λ=1 disables the diversity penalty — MMR degenerates to top-k."""
    cands = _candidates(spark, sf_dir)
    plain = [r.vec_id for r in cands.orderBy(F.desc("score"), "vec_id").collect()][:10]
    out = mmr_rerank(cands, 10, lambda_=1.0).orderBy("mmr_rank").collect()
    assert [r.vec_id for r in out] == plain
    # and mmr_score must be finite (the -inf sentinel must never leak)
    assert all(abs(r.mmr_score) < 1e9 for r in out)


def test_mmr_k_larger_than_candidates(spark, sf_dir):
    cands = _candidates(spark, sf_dir, k=4)
    out = mmr_rerank(cands, 10).collect()
    assert len(out) == 4


def test_mmr_rejects_bad_lambda_and_huge_groups(spark, sf_dir):
    cands = _candidates(spark, sf_dir, k=5)
    with pytest.raises(ValueError, match="lambda"):
        mmr_rerank(cands, 3, lambda_=1.5)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        mmr_rerank(cands, 3, max_candidates=2).collect()


def test_mmr_diversity_actually_penalizes(spark, sf_dir):
    """With λ=0 the second pick must be the candidate least similar to the
    first, regardless of relevance."""
    import numpy as np

    cands = _candidates(spark, sf_dir, k=10)
    rows = cands.collect()
    out = mmr_rerank(cands, 2, lambda_=0.0).orderBy("mmr_rank").collect()
    first = next(r for r in rows if r.vec_id == out[0].vec_id)
    fv = np.asarray(first.embedding, dtype=np.float64)
    fv /= np.linalg.norm(fv)

    def cos(r):
        v = np.asarray(r.embedding, dtype=np.float64)
        n = np.linalg.norm(v)
        return float(fv @ (v / n)) if n else 0.0

    others = [r for r in rows if r.vec_id != out[0].vec_id]
    want = min(others, key=lambda r: (cos(r), r.vec_id)).vec_id
    assert out[1].vec_id == want


def test_mmr_drops_null_relevance_candidates(spark, sf_dir):
    """A candidate with NULL score (undefined cosine, e.g. zero vector)
    must be excluded — NaN would otherwise win np.argmax and rank first."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).head()[1]
    cands = knn(emb.filter(F.col("vec_id") != 0), qv, 5)
    dim = len(qv)
    zero = spark.createDataFrame(
        [(999_999, [0.0] * dim, None)],
        "vec_id long, embedding array<double>, score double",
    )
    poisoned = cands.select("vec_id", "embedding", "score").unionByName(zero)
    out = mmr_rerank(poisoned, 6).collect()
    ids = {r.vec_id for r in out}
    assert 999_999 not in ids
    assert len(out) == 5  # the 5 real candidates survive


# ------------------------------------------------------- late interaction


def test_late_interaction_matches_manual_sum_of_max(spark, sf_dir):
    import numpy as np

    from vectordb_similarity_search_spark.operators.topk import (
        late_interaction_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvs = [r.embedding for r in emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()]
    chunks = emb.filter(F.col("vec_id") >= 3)
    got = late_interaction_topk(chunks, qvs, k=3, doc_col="label").collect()

    rows = chunks.select("label", "embedding").collect()
    Q = np.asarray(qvs, dtype=np.float64)
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    scores = {}
    for lbl in {r.label for r in rows}:
        X = np.asarray([r.embedding for r in rows if r.label == lbl], dtype=np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        scores[lbl] = float((X @ Q.T).max(axis=0).sum())
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [r.label for r in got] == [lbl for lbl, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r.score - s) < 1e-9


def test_late_interaction_single_exchange_plan(spark, sf_dir):
    from vectordb_similarity_search_spark.operators.topk import (
        late_interaction_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvs = [[0.1] * 8 * (len(emb.head().embedding) // 8)][:1]
    qvs = [list(emb.head().embedding)]
    import re

    plan = plan_of(late_interaction_topk(emb, qvs, k=5, doc_col="label"))
    # one partial-aggregated groupBy: exactly one exchange NODE (formatted
    # output prints each node twice: tree + detail), then TakeOrdered
    assert len(set(re.findall(r"Exchange \((\d+)\)", plan))) == 1
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_late_interaction_empty_queries_raise(spark, sf_dir):
    from vectordb_similarity_search_spark.operators.topk import (
        late_interaction_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="query vector"):
        late_interaction_topk(emb, [], k=3)


def test_mine_triplets_semantics_and_single_scan(spark, sf_dir):
    """Positive == true nearest neighbour; negatives are the best-ranked
    candidates >= margin below it; the whole mining runs in ONE corpus
    scan (role windows reuse the rank exchange)."""
    from vectordb_similarity_search_spark.operators.topk import (
        knn,
        mine_triplets,
    )
    from vectordb_similarity_search_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = mine_triplets(
        queries, emb.select("vec_id", "embedding"), n_neg=2, margin=0.05
    )
    rows = out.collect()
    by_anchor: dict = {}
    for r in rows:
        by_anchor.setdefault(r.anchor_id, {"positive": [], "negative": []})[
            r.role
        ].append((r.cand_id, r.score))
    for a, d in by_anchor.items():
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == a).head()["embedding"]
        ]
        top = knn(emb.filter(F.col("vec_id") != a), qv, 1).head()
        assert d["positive"] == [(top["vec_id"], round(top["score"], 6))]
        pos_s = d["positive"][0][1]
        assert len(d["negative"]) <= 2
        for _, s in d["negative"]:
            assert s <= round(pos_s - 0.05, 6) + 1e-9
    # two scans total (broadcast anchors + corpus): mining must not branch
    # into per-role re-scans of the similarity join
    from .conftest import plan_of

    plan = plan_of(
        mine_triplets(
            queries, emb.select("vec_id", "embedding"), n_neg=2, margin=0.05
        )
    )
    # tree lines look like "+- Scan parquet  (1)" (the detail section
    # repeats each node, so count tree occurrences only)
    assert plan.count("Scan parquet  (") == 2, plan


def test_grouped_knn_one_scan_with_group_limit(spark, sf_dir):
    """grouped_knn == per-group filtered knn, in ONE scan with the
    WindowGroupLimit pushdown (partial group-top-k before the exchange)."""
    from vectordb_similarity_search_spark.operators.topk import (
        grouped_knn,
        knn,
    )
    from vectordb_similarity_search_spark.plans.vector_queries import (
        _query_vec,
    )
    from vectordb_similarity_search_spark.sources.tables import load_table

    from .conftest import plan_of

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    corpus = emb.filter(F.col("vec_id") != 0)
    out = grouped_knn(corpus, qv, "label", k=2)
    got = {
        (r.label, r.rank): (r.vec_id, round(r.score, 6))
        for r in out.collect()
    }
    labels = {r.label for r in corpus.select("label").distinct().collect()}
    for lbl in labels:
        want = knn(corpus.filter(F.col("label") == lbl), qv, 2).collect()
        for i, r in enumerate(want):
            assert got[(lbl, i + 1)] == (r.vec_id, round(r.score, 6))
    plan = plan_of(grouped_knn(corpus, qv, "label", k=2))
    assert plan.count("Scan parquet  (") == 1, plan
    assert "WindowGroupLimit" in plan, plan


def test_mine_triplets_rejects_nonpositive_margin(spark, sf_dir):
    from vectordb_similarity_search_spark.operators.topk import mine_triplets
    from vectordb_similarity_search_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    with pytest.raises(ValueError, match="margin"):
        mine_triplets(queries, emb, margin=0.0)
