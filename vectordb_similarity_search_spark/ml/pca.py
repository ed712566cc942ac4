"""Distributed PCA over a vector column (dimensionality reduction for the
embedding-pipeline surface; absent from the reference, which ships raw
128-dim embeddings — similarity_search.py:25).

Spark-first design: the only distributed work is ONE Arrow pass emitting
per-batch second-moment partials (n, Σx, ΣxᵀX) — a (d+1)×d float block per
batch, independent of row count. The d×d eigendecomposition is driver-side
numpy (d is small: 20-128 here; at d where that breaks, you want
randomized sketching, not exact PCA). Projection broadcasts the (d×k)
component matrix and runs one BLAS matmul per Arrow batch — the same
shape as ml/embed.EmbeddingModel.transform.

Determinism: partials reduce on the driver after a deterministic sort
(same device as ml/embed.fit_batchnorm_stats), so a pinned input
partitioning gives bit-identical covariance; across partitionings the
difference is float reassociation (~1e-12), far below the round(6)
reporting precision.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..util import widen


def _moment_partials(df: DataFrame, in_col: str) -> list:
    out_schema = T.StructType(
        [
            T.StructField("part", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("s1", T.ArrayType(T.DoubleType())),
            T.StructField("s2", T.ArrayType(T.DoubleType())),  # row-major d*d
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for bi, pdf in enumerate(batches):
            if pdf.empty:
                continue
            X = np.vstack(pdf[in_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                [
                    {
                        "part": bi,
                        "n": len(X),
                        "s1": X.sum(axis=0).tolist(),
                        "s2": (X.T @ X).ravel().tolist(),
                    }
                ]
            )

    return sorted(
        widen(df.select(in_col)).mapInPandas(partials, out_schema).collect(),
        key=lambda r: (r["part"], r["n"], tuple(r["s1"])),
    )


class PcaModel:
    """Fitted PCA: mean (d,), components (d, k) column-orthonormal,
    explained_var (k,) descending."""

    def __init__(self, mean: np.ndarray, components: np.ndarray,
                 explained_var: np.ndarray, total_var: float):
        self.mean = mean
        self.components = components
        self.explained_var = explained_var
        self.total_var = total_var

    @property
    def explained_ratio(self) -> np.ndarray:
        return self.explained_var / self.total_var

    def transform(
        self, df: DataFrame, in_col: str = "embedding", out_col: str = "pca"
    ) -> DataFrame:
        """Project to the top-k subspace: one (batch × d) @ (d × k) matmul
        per Arrow batch; (mean, components) ride a broadcast variable."""
        bc = df.sparkSession.sparkContext.broadcast((self.mean, self.components))
        schema = T.StructType(
            df.schema.fields + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
        )

        def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            mean, comps = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.vstack(pdf[in_col].to_numpy()).astype(np.float64)
                P = (X - mean) @ comps
                pdf = pdf.copy()
                pdf[out_col] = list(P)
                yield pdf

        return df.mapInPandas(project, schema)


def fit_pca(df: DataFrame, in_col: str = "embedding", k: int = 8) -> PcaModel:
    """Fit exact PCA from one distributed moment pass (population
    covariance, matching numpy ``np.cov(X.T, bias=True)``)."""
    rows = _moment_partials(df, in_col)
    if not rows:
        raise ValueError("empty input")
    d = len(rows[0]["s1"])
    n = sum(r["n"] for r in rows)
    s1 = np.sum([r["s1"] for r in rows], axis=0)
    s2 = np.sum([np.asarray(r["s2"]).reshape(d, d) for r in rows], axis=0)
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # enforce symmetry against float drift
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order]
    # sign convention: largest-|.| coordinate of each component positive
    # (eigh's sign is arbitrary; pin it so runs/fixtures are comparable)
    flip = np.sign(comps[np.argmax(np.abs(comps), axis=0), np.arange(len(order))])
    flip[flip == 0] = 1.0
    return PcaModel(mean, comps * flip, evals, float(np.trace(cov)))
