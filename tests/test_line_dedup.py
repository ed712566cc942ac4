"""line_dedup semantics (CCNet-style corpus line dedup with rewrite).

Hand-built corpora pin keep-first ordering, partial-trailing-line
handling, and the rewrite; the registry oracle twin
(tests/test_oracle_parity.py) pins fixture-corpus parity.
"""

from __future__ import annotations

from vectordb_similarity_search_spark.operators.dedup import line_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r.doc_id: r for r in df.collect()}


def test_keep_first_occurrence_across_corpus(spark):
    # line "a1 a2 a3" appears in docs 1 (idx 0), 2 (idx 1) and twice in
    # doc 3: only the (doc 1, idx 0) occurrence survives.
    docs = _docs(
        spark,
        [
            (1, "a1 a2 a3 x1 x2 x3"),
            (2, "y1 y2 y3 a1 a2 a3"),
            (3, "a1 a2 a3 a1 a2 a3"),
        ],
    )
    got = _by_id(line_dedup(docs, line_tokens=3))
    assert (got[1].dropped_lines, got[1].clean_text) == (0, "a1 a2 a3 x1 x2 x3")
    assert (got[2].dropped_lines, got[2].clean_text) == (1, "y1 y2 y3")
    assert (got[3].dropped_lines, got[3].clean_text) == (2, "")
    assert got[3].clean_tokens == 0 and got[3].n_lines == 2


def test_within_doc_order_of_survivors_is_preserved(spark):
    # doc 2's middle line is the duplicate: survivors must rejoin in
    # original positional order, not sorted/arbitrary.
    docs = _docs(
        spark,
        [
            (1, "d1 d2 d3"),
            (2, "k1 k2 k3 d1 d2 d3 k4 k5 k6"),
        ],
    )
    got = _by_id(line_dedup(docs, line_tokens=3))
    assert got[2].clean_text == "k1 k2 k3 k4 k5 k6"
    assert (got[2].n_lines, got[2].dropped_lines, got[2].clean_tokens) == (
        3,
        1,
        6,
    )


def test_trailing_partial_line_participates(spark):
    # 4 tokens at line_tokens=3 -> lines ["t1 t2 t3", "t4"]; the 1-token
    # trailing line of doc 1 duplicates doc 2's trailing line.
    docs = _docs(
        spark,
        [
            (1, "t1 t2 t3 t4"),
            (2, "u1 u2 u3 t4"),
        ],
    )
    got = _by_id(line_dedup(docs, line_tokens=3))
    assert (got[1].n_lines, got[1].dropped_lines) == (2, 0)
    assert (got[2].n_lines, got[2].dropped_lines) == (2, 1)
    assert got[2].clean_text == "u1 u2 u3"


def test_clean_corpus_is_identity(spark):
    rows = [(i, f"w{i}a w{i}b w{i}c w{i}d") for i in range(8)]
    docs = _docs(spark, rows)
    got = _by_id(line_dedup(docs, line_tokens=2))
    for i, text in rows:
        assert got[i].dropped_lines == 0
        assert got[i].clean_text == text
        assert got[i].clean_tokens == 4
