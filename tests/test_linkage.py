"""Blocked fuzzy record linkage (operators/linkage.py)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.linkage import fuzzy_self_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


NAMES = [
    "alpha red box",
    "alpha red fox",
    "alpha blue box",
    "beta red box",
    "beta red box",  # duplicate row — must not self-pair
    "gamma green jar",
    None,  # dropped
]


def test_matches_bruteforce_within_blocks(spark):
    df = spark.createDataFrame([(n,) for n in NAMES], "p_name string")
    got = {
        (r["name_a"], r["name_b"], r["edit_dist"])
        for r in fuzzy_self_pairs(
            df, "p_name", F.substring_index(F.col("name"), " ", 1), 4
        ).collect()
    }
    distinct = sorted({n for n in NAMES if n is not None})
    want = set()
    for a, b in itertools.combinations(distinct, 2):
        if a.split(" ")[0] == b.split(" ")[0] and _lev(a, b) <= 4:
            want.add((min(a, b), max(a, b), _lev(a, b)))
    assert got == want
    assert all(a < b for a, b, _ in got)


def test_cross_block_pairs_excluded_even_if_close(spark):
    # "beta red box" vs "alpha red box" is within distance 4? (beta→alpha
    # is 4 edits) — but different blocks, so it must NOT appear.
    df = spark.createDataFrame([(n,) for n in NAMES], "p_name string")
    got = fuzzy_self_pairs(
        df, "p_name", F.substring_index(F.col("name"), " ", 1), 10
    ).collect()
    assert all(
        r["name_a"].split(" ")[0] == r["name_b"].split(" ")[0] for r in got
    )


def test_oversized_block_raises_instead_of_dropping(spark):
    rows = [(f"blk name {i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "p_name string")
    with pytest.raises(Exception) as ei:
        fuzzy_self_pairs(
            df,
            "p_name",
            F.substring_index(F.col("name"), " ", 1),
            2,
            max_block=10,
        ).collect()
    assert "max_block" in str(ei.value)


def test_max_dist_validation(spark):
    with pytest.raises(ValueError):
        fuzzy_self_pairs(None, "p_name", F.lit("x"), -1)
