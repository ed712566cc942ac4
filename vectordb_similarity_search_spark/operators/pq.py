"""Product quantization (PQ) with asymmetric-distance scoring and exact
rescore — the deep-compression tier of the vector store (public technique:
Jégou et al. 2011; the PQ of FAISS).

Vectors are split into ``m`` subspaces; each subspace gets a small k-means
codebook; a vector encodes to ``m`` code bytes (64-dim float32 → 8 bytes =
32x). Search is ADC: the query precomputes an (m × k) lookup table of
subspace dot products, so scoring a code is ``m`` table lookups + adds —
one numpy gather per Arrow batch here. Exact rescore of the top-C
candidates restores exact top-k.

Spark shape: codebooks train driver-side on a bounded SAMPLE (the standard
PQ recipe — codebooks are tiny and training needs k·m·iters distance
evals, not the corpus); encode/score are Arrow batch passes; the rescore
is a broadcast candidate semi-join. Cosine use: normalize vectors first
(dot over unit vectors == cosine), which also makes ADC error scale-free.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .topk import knn


def _kmeans(X: np.ndarray, k: int, iters: int, rng: np.random.Generator) -> np.ndarray:
    """Seeded Lloyd's on the driver (inputs are a bounded sample)."""
    centers = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            pts = X[assign == j]
            if len(pts):
                centers[j] = pts.mean(axis=0)
    return centers


class PqModel:
    """codebooks: (m, k, dsub) — subspace centroids."""

    def __init__(self, codebooks: np.ndarray):
        self.codebooks = codebooks
        self.m, self.k, self.dsub = codebooks.shape

    def encode(self, df: DataFrame, vec_col: str = "embedding",
               code_col: str = "pq_code") -> DataFrame:
        bc = df.sparkSession.sparkContext.broadcast(self.codebooks)
        schema = T.StructType(
            [f for f in df.schema.fields if f.name != vec_col]
            + [T.StructField(code_col, T.BinaryType())]
        )
        m, dsub = self.m, self.dsub

        def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            books = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                codes = np.empty((len(X), m), dtype=np.uint8)
                for s in range(m):
                    sub = X[:, s * dsub : (s + 1) * dsub]
                    d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                    codes[:, s] = d2.argmin(axis=1)
                out = pdf.drop(columns=[vec_col]).copy()
                out[code_col] = [c.tobytes() for c in codes]
                yield out

        return df.mapInPandas(enc, schema)

    def screen(
        self,
        codes: DataFrame,
        query_vec: Sequence[float],
        depth: int,
        *,
        id_col: str = "vec_id",
        code_col: str = "pq_code",
        metric: str = "cosine",
    ) -> DataFrame:
        """ADC top-``depth`` candidates (id, _adc) — the screen half of
        :meth:`search`, exposed for recall audits. The lookup
        table matches the metric: dot product (desc) for ``cosine`` — the
        corpus must have been encoded from normalized vectors (see fit_pq
        ``normalize``) — or squared subspace distance (asc) for ``l2``; a
        dot screen on un-normalized vectors would keep the LARGEST vectors,
        not the nearest."""
        if metric not in ("cosine", "l2"):
            raise ValueError(f"unsupported metric {metric!r}")
        q = np.asarray(query_vec, dtype=np.float64)
        qsub = (q / np.linalg.norm(q) if metric == "cosine" else q).reshape(
            self.m, self.dsub
        )
        if metric == "cosine":
            lut = np.einsum("mkd,md->mk", self.codebooks, qsub)  # (m × k) dots
        else:
            lut = ((self.codebooks - qsub[:, None, :]) ** 2).sum(axis=2)
        bc = codes.sparkSession.sparkContext.broadcast(lut)
        out_schema = T.StructType(
            [codes.schema[id_col], T.StructField("_adc", T.DoubleType())]
        )
        m = self.m

        def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            table = bc.value
            cols = np.arange(m)
            for pdf in batches:
                if pdf.empty:
                    continue
                C = np.vstack(
                    [np.frombuffer(b, dtype=np.uint8) for b in pdf[code_col]]
                ).astype(np.int64)
                s = table[cols[None, :], C].sum(axis=1)
                yield pd.DataFrame({id_col: pdf[id_col], "_adc": s})

        order = (
            F.col("_adc").desc() if metric == "cosine" else F.col("_adc").asc()
        )
        return (
            codes.select(id_col, code_col)
            .mapInPandas(adc, out_schema)
            .orderBy(order, F.col(id_col).asc())
            .limit(depth)
        )

    def search(
        self,
        codes: DataFrame,
        floats: DataFrame,
        query_vec: Sequence[float],
        k: int = 10,
        *,
        rescore: int = 100,
        id_col: str = "vec_id",
        code_col: str = "pq_code",
        vec_col: str = "embedding",
        metric: str = "cosine",
    ) -> DataFrame:
        """ADC screen → exact knn over the candidates (broadcast
        semi-join into the float table)."""
        cand = self.screen(
            codes, query_vec, rescore,
            id_col=id_col, code_col=code_col, metric=metric,
        )
        subset = floats.join(F.broadcast(cand.select(id_col)), id_col)
        return knn(subset, list(query_vec), k, id_col=id_col, vec_col=vec_col,
                   metric=metric)


def fit_pq(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    m: int = 8,
    k: int = 16,
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    normalize: bool = True,
) -> PqModel:
    """Train subspace codebooks on a bounded deterministic sample.
    ``normalize`` unit-norms the training vectors — use together with
    normalized corpus vectors for cosine search (dot == cosine)."""
    sample = df.select(vec_col).limit(sample_rows).collect()
    X = np.asarray([r[0] for r in sample], dtype=np.float64)
    if normalize:
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        X = X / norms
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible into {m} subspaces")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.stack(
        [
            _kmeans(X[:, s * dsub : (s + 1) * dsub], k, iters, rng)
            for s in range(m)
        ]
    )
    return PqModel(books)


def l2_normalized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Unit-normalize a vector column via one Arrow pass (cosine prep for
    PQ encode)."""
    schema = df.schema

    def norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(X, axis=1, keepdims=True)
            n[n == 0.0] = 1.0
            pdf = pdf.copy()
            pdf[vec_col] = list(X / n)
            yield pdf

    return df.mapInPandas(norm, schema)
