"""substring_dup_spans / substring_dup_stats semantics (ExactSubstr family).

Hand-built corpora pin the span algebra (island merge, adjacency
boundary, short-doc exclusion, scope modes); a brute-force python
replica pins corpus parity at fixture scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vectordb_similarity_search_spark.operators.dedup import (
    substring_dup_spans,
    substring_dup_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df):
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in df.collect()
    )


def test_shared_run_produces_one_merged_span(spark):
    # docs 1 and 2 share tokens a1..a6 (positions 2-7 in doc 1, 1-6 in
    # doc 2): with k=4 the three overlapping shared 4-grams must merge
    # into ONE maximal span covering the whole shared run.
    shared = "a1 a2 a3 a4 a5 a6"
    docs = _docs(
        spark,
        [
            (1, "x0 " + shared + " y0 y1"),
            (2, shared + " z0 z1 z2"),
            (3, "u0 u1 u2 u3 u4 u5 u6 u7"),
        ],
    )
    got = _spans(substring_dup_spans(docs, k=4))
    assert got == [(1, 2, 7, 6), (2, 1, 6, 6)]


def test_disjoint_runs_stay_separate_islands(spark):
    # two shared runs separated by one non-shared token: spans must NOT
    # merge across the gap (next start == prev start + k + 1 boundary).
    run1, run2 = "a1 a2 a3 a4", "b1 b2 b3 b4"
    docs = _docs(
        spark,
        [
            (1, run1 + " gap1 " + run2),
            (2, run1 + " gap2 " + run2),
        ],
    )
    got = _spans(substring_dup_spans(docs, k=4))
    assert got == [
        (1, 1, 4, 4),
        (1, 6, 9, 4),
        (2, 1, 4, 4),
        (2, 6, 9, 4),
    ]


def test_adjacent_intervals_merge(spark):
    # doc 1 shares "a1..a4" with doc 2 and "b1..b4" with doc 3, back to
    # back: intervals [1,4] and [5,8] are adjacent (start 5 == 1 + k)
    # and must merge into one span even though no single shared 4-gram
    # crosses the boundary.
    docs = _docs(
        spark,
        [
            (1, "a1 a2 a3 a4 b1 b2 b3 b4"),
            (2, "a1 a2 a3 a4 c0 c1 c2 c3"),
            (3, "d0 d1 d2 d3 b1 b2 b3 b4"),
        ],
    )
    got = _spans(substring_dup_spans(docs, k=4))
    assert got == [(1, 1, 8, 8), (2, 1, 4, 4), (3, 5, 8, 4)]


def test_short_docs_and_clean_docs_emit_nothing(spark):
    docs = _docs(
        spark,
        [
            (1, "a1 a2 a3"),  # shorter than k: no grams at all
            (2, "a1 a2 a3"),
            (3, "c1 c2 c3 c4 c5"),  # long enough, nothing shared
        ],
    )
    assert _spans(substring_dup_spans(docs, k=4)) == []


def test_scope_any_catches_within_doc_repeats(spark):
    # the repeated run lives in ONE document: cross_doc scope must stay
    # silent, scope='any' must flag both occurrences.
    docs = _docs(
        spark,
        [
            (1, "a1 a2 a3 a4 gap a1 a2 a3 a4"),
            (2, "b1 b2 b3 b4 b5 b6 b7 b8 b9"),
        ],
    )
    assert _spans(substring_dup_spans(docs, k=4)) == []
    got = _spans(substring_dup_spans(docs, k=4, scope="any"))
    assert got == [(1, 1, 4, 4), (1, 6, 9, 4)]


def test_stats_cover_clean_docs_with_zeros(spark):
    docs = _docs(
        spark,
        [
            (1, "a1 a2 a3 a4 y0"),
            (2, "a1 a2 a3 a4"),
            (3, "c1 c2 c3 c4 c5"),
        ],
    )
    rows = {
        r.doc_id: r
        for r in substring_dup_stats(docs, k=4).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert (rows[1].dup_spans, rows[1].dup_tokens) == (1, 4)
    assert rows[1].n_tokens == 5 and rows[1].dup_frac == 0.8
    assert (rows[2].dup_spans, rows[2].dup_tokens, rows[2].dup_frac) == (
        1,
        4,
        1.0,
    )
    assert (rows[3].dup_spans, rows[3].dup_tokens, rows[3].dup_frac) == (
        0,
        0,
        0.0,
    )


def test_validation(spark):
    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="k must be"):
        substring_dup_spans(docs, k=1)
    with pytest.raises(ValueError, match="scope"):
        substring_dup_spans(docs, k=4, scope="weird")


def _brute_spans(rows, k, min_freq):
    """Reference implementation: dict-of-gram counting + interval merge."""
    from collections import defaultdict

    occ = defaultdict(set)
    toks = {d: t.split(" ") for d, t in rows}
    for d, tk in toks.items():
        for p in range(len(tk) - k + 1):
            occ[tuple(tk[p : p + k])].add(d)
    out = []
    for d, tk in toks.items():
        pos = sorted(
            p + 1
            for p in range(len(tk) - k + 1)
            if len(occ[tuple(tk[p : p + k])]) >= min_freq
        )
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = p + k - 1
            else:
                spans.append([p, p + k - 1])
        out += [(d, s, e, e - s + 1) for s, e in spans]
    return sorted(out)


def test_parity_with_bruteforce_on_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    got = _spans(substring_dup_spans(docs, k=6))
    assert got == _brute_spans(rows, 6, 2)
    assert got  # fixture near-dups guarantee a non-empty span set


def test_single_token_stream_scan(spark, sf_dir):
    # one parquet scan feeds both the frequency window and the marking —
    # the operator must NOT re-read the corpus per branch.
    df = substring_dup_spans(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), k=8
    )
    from .conftest import plan_of

    plan = plan_of(df)
    assert plan.count("Scan parquet  (") == 1
