"""ml/als: distributed ALS semantics.

The catalog row (r_als_recs) is pinned by its expected-parquet oracle;
these tests pin the trainer against a pure-Python replica of the
documented recurrence — bit-exact factors — plus layout independence,
RMSE monotonicity on a structured matrix, and validation.
"""

from __future__ import annotations

import numpy as np
import pytest

from vectordb_similarity_search_spark.ml.als import (
    als_fit,
    als_recommend,
    init_factors,
)


def _python_als(rows, rank=3, reg=0.1, n_iter=2):
    """Reference replica: same init, same sorted fold, same solves."""
    items = sorted({i for _, i, _ in rows})
    yf = init_factors(items, rank, tag="item")
    xf = {}
    by_user: dict = {}
    by_item: dict = {}
    for u, i, r in rows:
        by_user.setdefault(u, []).append((i, r))
        by_item.setdefault(i, []).append((u, r))
    for _ in range(n_iter):
        xf = {}
        for u, lst in by_user.items():
            A = np.eye(rank) * reg
            b = np.zeros(rank)
            for i, r in sorted(lst):
                A = A + np.outer(yf[i], yf[i])
                b = b + r * yf[i]
            xf[u] = np.linalg.solve(A, b)
        yf = {}
        for i, lst in by_item.items():
            A = np.eye(rank) * reg
            b = np.zeros(rank)
            for u, r in sorted(lst):
                A = A + np.outer(xf[u], xf[u])
                b = b + r * xf[u]
            yf[i] = np.linalg.solve(A, b)
    return xf, yf


@pytest.fixture(scope="module")
def toy_ratings():
    return [
        (u, i, float((u * i) % 5 + 1))
        for u in range(1, 9)
        for i in range(1, 7)
        if (u + i) % 3
    ]


def test_als_matches_python_replica_bitexact(spark, toy_ratings):
    r = spark.createDataFrame(
        toy_ratings, "user_id long, item_id long, rating double"
    )
    uf, itf, _ = als_fit(r, rank=3, reg=0.1, n_iter=2)
    xf, yf = _python_als(toy_ratings, rank=3, reg=0.1, n_iter=2)
    got_u = {row["u"]: list(row["f"]) for row in uf.collect()}
    got_i = {row["i"]: list(row["f"]) for row in itf.collect()}
    assert got_u == {u: list(v) for u, v in xf.items()}
    assert got_i == {i: list(v) for i, v in yf.items()}


def test_als_layout_independent(spark, toy_ratings):
    r = spark.createDataFrame(
        toy_ratings, "user_id long, item_id long, rating double"
    )
    a = als_fit(r, rank=3, n_iter=2)
    b = als_fit(r.repartition(7, "item_id"), rank=3, n_iter=2)
    fa = {row["u"]: list(row["f"]) for row in a[0].collect()}
    fb = {row["u"]: list(row["f"]) for row in b[0].collect()}
    assert fa == fb
    assert a[2] == b[2]  # exact integer-quantized RMSE, both rounds


def test_als_rmse_decreases(spark):
    # structured rank-2 matrix + small noise: ALS must fit it
    rng = np.random.default_rng(3)
    xs = rng.normal(size=(12, 2))
    ys = rng.normal(size=(9, 2))
    rows = [
        (u, i, float(xs[u] @ ys[i]))
        for u in range(12)
        for i in range(9)
        if (u + i) % 4
    ]
    r = spark.createDataFrame(
        rows, "user_id long, item_id long, rating double"
    )
    _, _, rmse = als_fit(r, rank=2, reg=0.01, n_iter=3)
    assert rmse[-1] < rmse[0]
    assert rmse[-1] < 0.05


def test_als_recommend_shape_and_exclusions(spark, toy_ratings):
    r = spark.createDataFrame(
        toy_ratings, "user_id long, item_id long, rating double"
    )
    uf, itf, _ = als_fit(r, rank=3, n_iter=2)
    recs = als_recommend(uf, itf, [1, 2], k=2).collect()
    per_user: dict = {}
    for row in recs:
        per_user.setdefault(row["u"], []).append(row["rank"])
    assert set(per_user) == {1, 2}
    assert all(sorted(v) == [1, 2] for v in per_user.values())


def test_als_validation(spark, toy_ratings):
    r = spark.createDataFrame(
        toy_ratings, "user_id long, item_id long, rating double"
    )
    with pytest.raises(ValueError):
        als_fit(r, rank=0)
    with pytest.raises(ValueError):
        als_fit(r, n_iter=0)
    with pytest.raises(ValueError):
        als_fit(r, reg=0.0)


def test_als_layout_independent_with_duplicate_keys(spark):
    """Regression (review find): duplicate (user, item) rows — an event
    log rather than a pre-aggregated matrix — must still fold
    deterministically; the (id, rating) sort key covers equal-id rows
    whatever order the shuffle delivers them in."""
    rows = [
        (u, i, float((u * 7 + i * 3 + rep) % 5 + 1))
        for u in range(1, 6)
        for i in range(1, 5)
        for rep in range(2)  # two ratings per (u, i) pair
    ]
    r = spark.createDataFrame(
        rows, "user_id long, item_id long, rating double"
    )
    a = als_fit(r, rank=2, n_iter=2)
    b = als_fit(r.repartition(5, "user_id"), rank=2, n_iter=2)
    fa = {row["u"]: list(row["f"]) for row in a[0].collect()}
    fb = {row["u"]: list(row["f"]) for row in b[0].collect()}
    assert fa == fb
    assert a[2] == b[2]


def test_als_empty_ratings_raises(spark, toy_ratings):
    r = spark.createDataFrame(
        toy_ratings, "user_id long, item_id long, rating double"
    )
    with pytest.raises(ValueError, match="empty"):
        als_fit(r.filter("user_id < 0"))
