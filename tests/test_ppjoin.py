"""operators/dedup.ppjoin_pairs — exact prefix-filtered set-similarity
join: brute-force parity (the exactness contract), threshold validation,
and the oversized-bucket raise."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.dedup import ppjoin_pairs


def _brute(rows: list[tuple[int, list[str]]], t_pm: int) -> set:
    sets = {i: set(s) for i, s in rows if s}
    out = set()
    for a, b in combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if u and 1000 * i >= t_pm * u:
            out.add((a, b, i, u))
    return out


ROWS = [
    (1, ["a", "b", "c", "d"]),
    (2, ["a", "b", "c", "e"]),          # J(1,2) = 3/5 = 0.6 (boundary)
    (3, ["a", "b", "c", "d"]),          # J(1,3) = 1.0 exact dup
    (4, ["x", "y", "z"]),               # disjoint from 1-3
    (5, ["x", "y", "z", "w", "q"]),     # J(4,5) = 3/5 = 0.6
    (6, ["q"]),                         # singleton set
    (7, []),                            # empty set: never pairs
    (8, ["a", "a", "b", "b", "c", "d"]),  # dups collapse -> == set 1
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(
        [(i, s) for i, s in rows], "id long, toks array<string>"
    )


def test_ppjoin_matches_brute_force(spark):
    got = {
        (r.id_a, r.id_b, r.n_inter, r.n_union)
        for r in ppjoin_pairs(_df(spark), "id", "toks", 0.6).collect()
    }
    want = _brute(ROWS, 600)
    assert got == want
    # the fixture exercises the boundary (3/5 == 0.6 kept) and exact dups
    assert (1, 2, 3, 5) in got and (1, 3, 4, 4) in got and (1, 8, 4, 4) in got


@pytest.mark.parametrize("thr", [0.5, 0.75, 0.9, 1.0])
def test_ppjoin_thresholds(spark, thr):
    got = {
        (r.id_a, r.id_b, r.n_inter, r.n_union)
        for r in ppjoin_pairs(_df(spark), "id", "toks", thr).collect()
    }
    assert got == _brute(ROWS, round(thr * 1000))


def test_ppjoin_threshold_validation(spark):
    df = _df(spark)
    for bad in (0.0, -0.1, 1.5, 0.12345):  # 0.12345 not permille-exact
        with pytest.raises(ValueError, match="permille"):
            ppjoin_pairs(df, "id", "toks", bad)


def test_ppjoin_oversized_bucket_raises(spark):
    # every set shares the one (rare-ordered) token -> one bucket of 40
    rows = [(i, [f"u{i}", "hot"]) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    with pytest.raises(Exception, match="max_bucket"):
        ppjoin_pairs(df, "id", "toks", 0.5, max_bucket=10).collect()


def test_ppjoin_jaccard_column_matches_counts(spark):
    for r in ppjoin_pairs(_df(spark), "id", "toks", 0.5).collect():
        assert r.jaccard == pytest.approx(r.n_inter / r.n_union, abs=1e-6)


def test_ppjoin_layout_independent(spark):
    df = _df(spark).repartition(7, F.col("id"))
    got = {
        (r.id_a, r.id_b, r.n_inter, r.n_union)
        for r in ppjoin_pairs(df, "id", "toks", 0.6).collect()
    }
    assert got == _brute(ROWS, 600)


# --------------------------------------------------------------------------
# containment_pairs
# --------------------------------------------------------------------------


def _brute_containment(rows, t_pm):
    sets = {i: set(s) for i, s in rows if s}
    out = set()
    for a in sets:
        for b in sets:
            if a == b:
                continue
            i = len(sets[a] & sets[b])
            if 1000 * i >= t_pm * len(sets[a]):
                out.add((a, b, i, len(sets[a])))
    return out


def test_containment_catches_excerpts(spark):
    """The semantic reason this operator exists: an excerpt (A strictly
    inside a 5x larger B) has containment 1.0 but Jaccard 0.2 — the
    Jaccard join misses it at 0.6, the containment join reports exactly
    the (A contained-in B) direction."""
    from vectordb_similarity_search_spark.operators.dedup import (
        containment_pairs,
        ppjoin_pairs,
    )

    big = [f"t{i}" for i in range(20)]
    rows = [(1, big[:4]), (2, big)]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    jac = ppjoin_pairs(df, "id", "toks", 0.6).collect()
    assert jac == []  # J = 4/20 = 0.2
    got = {
        (r.contained_id, r.container_id, r.n_inter, r.n_contained)
        for r in containment_pairs(df, "id", "toks", 0.9).collect()
    }
    assert got == {(1, 2, 4, 4)}  # one direction only


@pytest.mark.parametrize("thr", [0.5, 0.9, 1.0])
def test_containment_matches_brute_force(spark, thr):
    from vectordb_similarity_search_spark.operators.dedup import (
        containment_pairs,
    )

    got = {
        (r.contained_id, r.container_id, r.n_inter, r.n_contained)
        for r in containment_pairs(_df(spark), "id", "toks", thr).collect()
    }
    assert got == _brute_containment(ROWS, round(thr * 1000))


def test_containment_oversized_bucket_raises(spark):
    from vectordb_similarity_search_spark.operators.dedup import (
        containment_pairs,
    )

    rows = [(i, [f"u{i}", "hot"]) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    with pytest.raises(Exception, match="max_bucket"):
        containment_pairs(df, "id", "toks", 0.5, max_bucket=5).collect()


def test_word_ngrams_all_keeps_multiplicity_and_order(spark):
    """word_ngrams_all is the LM-count sibling of word_ngrams: every
    bigram in document order, repeats kept; below-n inputs yield []."""
    from vectordb_similarity_search_spark.functions.text import (
        word_ngrams,
        word_ngrams_all,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a b a b",), ("x",), ("",)], "text: string"
    ).select(
        word_ngrams_all(F.split("text", r"\s+"), 2).alias("all2"),
        word_ngrams(F.split("text", r"\s+"), 2).alias("set2"),
    )
    rows = df.collect()
    assert rows[0].all2 == ["a b", "b a", "a b"]
    assert sorted(rows[0].set2) == ["a b", "b a"]
    assert rows[1].all2 == []
