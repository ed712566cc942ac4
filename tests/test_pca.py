"""Distributed PCA: numpy parity, projection correctness, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from vectordb_similarity_search_spark.ml.pca import fit_pca


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(7)
    # anisotropic cloud: known dominant directions
    B = rng.standard_normal((6, 6)) * np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.1])
    X = rng.standard_normal((400, 6)) @ B.T
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "id long, vec array<double>",
    ).repartition(5)
    return X, df


def test_matches_numpy_eig(spark, data):
    X, df = data
    m = fit_pca(df, "vec", k=6)
    cov = np.cov(X.T, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(m.explained_var, evals, rtol=1e-8)
    assert np.allclose(m.mean, X.mean(axis=0), rtol=1e-8)
    # components are orthonormal and diagonalize the covariance
    assert np.allclose(m.components.T @ m.components, np.eye(6), atol=1e-8)
    proj_var = np.diag(m.components.T @ cov @ m.components)
    assert np.allclose(proj_var, m.explained_var, rtol=1e-8)


def test_transform_projects(spark, data):
    X, df = data
    m = fit_pca(df, "vec", k=2)
    got = {r.id: np.array(r.pca) for r in m.transform(df, "vec").collect()}
    want = (X - m.mean) @ m.components
    for i in range(len(X)):
        assert np.allclose(got[i], want[i], atol=1e-8)
    # top-2 subspace captures most of this anisotropic cloud's variance
    assert m.explained_ratio.sum() > 0.75


def test_deterministic_across_partitioning(spark, data):
    X, df = data
    a = fit_pca(df.repartition(3), "vec", k=4)
    b = fit_pca(df.repartition(11), "vec", k=4)
    assert np.allclose(a.explained_var, b.explained_var, atol=1e-9)
    assert np.allclose(np.abs(a.components), np.abs(b.components), atol=1e-7)


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec array<double>")
    with pytest.raises(ValueError):
        fit_pca(df, "vec")
