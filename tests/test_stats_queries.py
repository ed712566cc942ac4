"""Plan-shape and semantics tests for the eighth-session statistics
queries (e_ewma_smooth, r_benford, r_corr_matrix, t_keyword_tfidf).

Value parity vs the DuckDB twins is covered by tests/test_oracle_parity.py
(full registry); these pin the physical shapes the docstrings claim and
the algebraic invariants an oracle hash cannot see.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vectordb_similarity_search_spark.plans import REGISTRY
from vectordb_similarity_search_spark.plans.event_queries import _EWMA_W

from .conftest import plan_of


def _tree_scans(plan: str) -> int:
    # "Scan parquet" is a substring of "FileScan parquet" in other modes;
    # formatted-mode tree lines are "Scan parquet  (" (round-4 learning).
    return plan.count("Scan parquet  (")


def test_ewma_weights_are_exact_and_sum_to_one():
    # dyadic rationals 3^j / 4^(j+1): float repr round-trips exactly
    for j, w in enumerate(_EWMA_W[:11]):
        assert w == 3**j / 4 ** (j + 1)
        assert float(repr(w)) == w
    assert _EWMA_W[11] == 3**11 / 4**11
    assert math.fsum(_EWMA_W) == 1.0


def test_ewma_single_window_exchange(spark, sf_dir):
    """lag(1..11) and row_number share one frame: exactly one Window node
    over one hashpartitioning(event_type) exchange, one source scan."""
    plan = plan_of(REGISTRY["e_ewma_smooth"].fn(spark, sf_dir))
    assert plan.count("+- Window (") == 1, plan
    # exactly two exchanges: the hourly groupBy + the per-series window
    assert plan.count("+- Exchange (") == 2, plan
    assert _tree_scans(plan) == 1, plan


def test_ewma_matches_recursive_form(spark, sf_dir):
    """The unrolled 12-term sum == the textbook recursion seeded 11 steps
    back (s = x at the oldest in-frame point), per series."""
    rows = (
        REGISTRY["e_ewma_smooth"]
        .fn(spark, sf_dir)
        .filter(F.col("event_type") == F.lit("view"))
        .orderBy("hour_start")
        .limit(40)
        .collect()
    )
    assert len(rows) == 40
    # The frame is the trailing 12 OBSERVATIONS of the series (hour gaps
    # irrelevant), and emitted rows are exactly the rn>=12 rows in order —
    # so for any emitted idx>=11 the frame is rows[idx-11..idx].
    totals = [r["total"] for r in rows]
    for idx in range(11, len(rows)):
        s = totals[idx - 11]
        for j in range(idx - 10, idx + 1):
            s = 0.25 * totals[j] + 0.75 * s
        assert abs(s - rows[idx]["ewma"]) < 1e-6, idx


def test_benford_single_scan_and_shares(spark, sf_dir):
    df = REGISTRY["r_benford"].fn(spark, sf_dir)
    assert _tree_scans(plan_of(df)) == 1
    rows = df.collect()
    assert {r["digit"] for r in rows} <= set(range(10))
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-5
    for r in rows:
        if r["digit"] >= 1:
            assert r["benford_share"] == round(
                math.log10(1 + 1 / r["digit"]), 6
            )
            assert (
                abs(abs(r["obs_share"] - r["benford_share"]) - r["abs_dev"])
                < 2e-6
            )


def test_corr_matrix_one_scan_matches_spark_corr(spark, sf_dir):
    """One lineitem scan; values match Spark's own corr() within float
    tolerance (the sufficient-stats decomposition is exact, corr() is
    a streaming float aggregate — agreement to 1e-6 is the check)."""
    from vectordb_similarity_search_spark.plans.relational_queries import (
        _CORR_COLS,
    )
    from vectordb_similarity_search_spark.sources.tables import load_table

    df = REGISTRY["r_corr_matrix"].fn(spark, sf_dir)
    assert _tree_scans(plan_of(df)) == 1, "must not rescan per pair"
    got = {(r["col_a"], r["col_b"]): r["corr_r"] for r in df.collect()}
    assert len(got) == 6
    li = load_table(spark, sf_dir, "lineitem")
    for (a, b), v in got.items():
        assert a in _CORR_COLS and b in _CORR_COLS
        ref = li.agg(F.corr(a, b)).first()[0]
        assert abs(v - ref) < 1e-6, (a, b, v, ref)


def test_keyword_tfidf_broadcast_group_limit(spark, sf_dir):
    plan = plan_of(REGISTRY["t_keyword_tfidf"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan
    assert "SortMergeJoin" not in plan, "tf side must broadcast"


def test_keyword_tfidf_top3_per_doc(spark, sf_dir):
    rows = REGISTRY["t_keyword_tfidf"].fn(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc and all(d < 30 for d in by_doc)
    for d, rs in by_doc.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        rs = sorted(rs, key=lambda r: r["rank"])
        for i in range(len(rs) - 1):
            assert rs[i]["score"] >= rs[i + 1]["score"] - 1e-9


def test_banding_curve_truth_matches_bruteforce(spark, sf_dir):
    """The advisor's exact ground-truth pair count must equal a pure-Python
    brute-force all-pairs Jaccard over the same capped doc set — the
    inverted-index shortcut may not drop or double-count anything. Also
    pins the basic report invariants (caught <= candidates, caught <=
    true, rates in [0,1])."""
    from itertools import combinations

    from vectordb_similarity_search_spark.operators.dedup import _shingle_set
    from vectordb_similarity_search_spark.plans import REGISTRY

    rows = REGISTRY["d_banding_curve"].fn(spark, sf_dir).collect()
    assert [r["bands"] for r in sorted(rows, key=lambda r: r["bands"])] == [
        4, 8, 16, 32,
    ]
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 500")
        .select("doc_id", "text")
        .collect()
    }
    sets = {i: _shingle_set(t, 5, "char") for i, t in texts.items()}
    brute = 0
    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        if inter and inter / (len(sa) + len(sb) - inter) >= 0.3:
            brute += 1
    for r in rows:
        assert r["n_true"] == brute
        assert 0 <= r["n_caught"] <= min(r["n_candidates"], r["n_true"])
        if r["recall"] is not None:
            assert 0.0 <= r["recall"] <= 1.0
        if r["precision"] is not None:
            assert 0.0 <= r["precision"] <= 1.0
