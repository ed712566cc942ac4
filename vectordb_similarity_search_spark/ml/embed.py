"""Embedding model + federated training — the reference's similarity-
structure-preserving autoencoder (similarity_search.py:22-47) and FedAvg
loop (:436-493), re-expressed for Spark:

- model = plain numpy MLP (20→256→128(ReLU)→128); torch isn't in this
  environment, and the math (forward + gram-matrix-MSE backprop + Adam) is
  ~80 lines of numpy. TRAIN-mode BatchNorm/Dropout from the reference
  (:29-37) are dropped — they are the source of its run-to-run
  nondeterminism (SURVEY.md §5) — but INFERENCE-mode BatchNorm is
  supported with deterministically-fit running statistics
  (``fit_batchnorm_stats`` / ``EmbeddingModel.with_batchnorm``), so the
  served model family matches the reference's eval() network (Dropout is
  identity at eval).
- local training runs ON EXECUTORS, one task per hospital partition
  (``applyInPandas`` grouped by hospital) — the reference's client.fit
  (:212-248) without the pretend-federation: what crosses the wire is
  (hospital, n_samples, weights), never patient rows.
- FedAvg (:476-493, A7) = sample-weighted parameter mean on the driver
  (weights are ~180 KB — driver-side numpy is the right tool, SURVEY.md
  §2.7 T4/T5).
- batch scoring is an Arrow-batched ``mapInPandas`` with broadcast weights
  (V3): one numpy matmul per batch, never per-row Python.

Loss (T2, :232-238): L = MSE(E·Eᵀ, X·Xᵀ) per batch — embeddings preserve
the batch's similarity structure. dL/dE = 4/B²·(EEᵀ−XXᵀ)·E.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LAYER_DIMS = [(20, 256), (256, 128), (128, 128)]  # reference :25


def _init_params(seed: int = 42, dims=None) -> list[np.ndarray]:
    """He-init weight/bias pairs, deterministic (fixes the reference's
    unseeded torch init, SURVEY.md §5)."""
    rng = np.random.default_rng(seed)
    params: list[np.ndarray] = []
    for d_in, d_out in dims or LAYER_DIMS:
        params.append(rng.standard_normal((d_in, d_out)) * np.sqrt(2.0 / d_in))
        params.append(np.zeros(d_out))
    return params


def _forward(
    params: list[np.ndarray],
    X: np.ndarray,
    bn: list[tuple[np.ndarray, np.ndarray]] | None = None,
) -> np.ndarray:
    """20→256 ReLU → 128 ReLU → 128 linear (reference :40-47).

    ``bn``: optional per-hidden-layer (mean, var) running statistics for
    INFERENCE-MODE BatchNorm — the deterministic analogue of the
    reference's ``nn.BatchNorm1d`` in eval() (reference :29-37: each
    hidden block is Linear→ReLU→Dropout→BatchNorm; at inference Dropout is
    identity and BatchNorm is the running-stats affine). Our batch-stats
    training nondeterminism objection (SURVEY.md §5) applies to TRAIN-mode
    BN only; eval-mode BN with stats fit deterministically over the
    training corpus (``fit_batchnorm_stats``) closes the model-family gap.
    gamma/beta stay at their init (1, 0): we never backprop through BN.
    """
    W1, b1, W2, b2, W3, b3 = params
    eps = 1e-5
    H1 = np.maximum(X @ W1 + b1, 0.0)
    if bn is not None:
        m, v = bn[0]
        H1 = (H1 - m) / np.sqrt(v + eps)
    H2 = np.maximum(H1 @ W2 + b2, 0.0)
    if bn is not None:
        m, v = bn[1]
        H2 = (H2 - m) / np.sqrt(v + eps)
    return H2 @ W3 + b3


def _grads(params: list[np.ndarray], X: np.ndarray) -> tuple[float, list[np.ndarray]]:
    """Gram-matrix MSE loss + full backprop in numpy."""
    W1, b1, W2, b2, W3, b3 = params
    Z1 = X @ W1 + b1
    H1 = np.maximum(Z1, 0.0)
    Z2 = H1 @ W2 + b2
    H2 = np.maximum(Z2, 0.0)
    E = H2 @ W3 + b3

    B = X.shape[0]
    D = E @ E.T - X @ X.T                       # gram diff (symmetric)
    loss = float((D * D).mean())
    dE = (4.0 / (B * B)) * (D @ E)              # dL/dE

    dW3 = H2.T @ dE
    db3 = dE.sum(axis=0)
    dH2 = (dE @ W3.T) * (Z2 > 0)
    dW2 = H1.T @ dH2
    db2 = dH2.sum(axis=0)
    dH1 = (dH2 @ W2.T) * (Z1 > 0)
    dW1 = X.T @ dH1
    db1 = dH1.sum(axis=0)
    return loss, [dW1, db1, dW2, db2, dW3, db3]


def train_local(
    params: list[np.ndarray],
    X: np.ndarray,
    *,
    epochs: int = 5,
    batch_size: int = 32,
    lr: float = 1e-3,
    seed: int = 42,
) -> tuple[list[np.ndarray], float]:
    """Local Adam training (reference fit, :212-248: batch 32, lr 1e-3;
    unlike the reference we shuffle with a seeded rng and keep the last
    partial batch)."""
    rng = np.random.default_rng(seed)
    params = [p.copy() for p in params]
    m = [np.zeros_like(p) for p in params]
    v = [np.zeros_like(p) for p in params]
    t, b1m, b2m, eps = 0, 0.9, 0.999, 1e-8
    last_loss = float("nan")
    for _ in range(epochs):
        idx = rng.permutation(len(X))
        for start in range(0, len(X), batch_size):
            batch = X[idx[start : start + batch_size]]
            if len(batch) < 2:
                continue  # gram loss needs ≥2 rows
            loss, grads = _grads(params, batch)
            last_loss = loss
            t += 1
            for i, g in enumerate(grads):
                m[i] = b1m * m[i] + (1 - b1m) * g
                v[i] = b2m * v[i] + (1 - b2m) * g * g
                mh = m[i] / (1 - b1m**t)
                vh = v[i] / (1 - b2m**t)
                params[i] = params[i] - lr * mh / (np.sqrt(vh) + eps)
    return params, last_loss


def fedavg(results: list[tuple[list[np.ndarray], int]]) -> list[np.ndarray]:
    """Sample-weighted parameter average (reference :476-493, A7)."""
    total = sum(n for _, n in results)
    out = [np.zeros_like(p) for p in results[0][0]]
    for params, n in results:
        w = n / total
        for i, p in enumerate(params):
            out[i] += w * p
    return out


def fit_batchnorm_stats(
    params: list[np.ndarray],
    df: DataFrame,
    in_col: str = "features",
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Fit deterministic BatchNorm running statistics over a corpus,
    distributed, in TWO Arrow passes: pass 1 fits layer-1 stats on the raw
    H1 activations; pass 2 fits layer-2 stats on H2 computed with layer 1
    ALREADY normalized by those global stats — matching the network that
    inference actually runs (``_forward`` applies BN1 before the layer-2
    matmul; fitting BN2 on raw-H1 activations would describe a
    distribution the served network never produces). Each pass's partials
    (n, Σh, Σh²) are a few float rows, reduced driver-side after a
    deterministic sort. Population stats; bit-identical for a fixed
    partitioning (the sort pins reduce order), equal to ~1e-12 across
    partitionings (float reassociation — the same property Spark's own
    float ``sum`` has)."""
    out_schema = T.StructType(
        [
            T.StructField("part", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("s1", T.ArrayType(T.DoubleType())),
            T.StructField("s2", T.ArrayType(T.DoubleType())),
        ]
    )
    eps = 1e-5

    def _fit_layer(make_h) -> tuple[np.ndarray, np.ndarray]:
        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for bi, pdf in enumerate(batches):
                if pdf.empty:
                    continue
                X = np.vstack(pdf[in_col].to_numpy()).astype(np.float64)
                H = make_h(X)
                yield pd.DataFrame(
                    [
                        {
                            "part": bi,
                            "n": len(H),
                            "s1": H.sum(axis=0).tolist(),
                            "s2": (H * H).sum(axis=0).tolist(),
                        }
                    ]
                )

        rows = sorted(
            df.select(in_col).mapInPandas(partials, out_schema).collect(),
            key=lambda r: (r["part"], r["n"], tuple(r["s1"])),
        )
        n = sum(r["n"] for r in rows)
        s1 = np.sum([r["s1"] for r in rows], axis=0)
        s2 = np.sum([r["s2"] for r in rows], axis=0)
        mean = s1 / n
        var = np.maximum(s2 / n - mean * mean, 0.0)
        return mean, var

    bc = df.sparkSession.sparkContext.broadcast(params)

    def h1_raw(X: np.ndarray) -> np.ndarray:
        W1, b1 = bc.value[0], bc.value[1]
        return np.maximum(X @ W1 + b1, 0.0)

    m1, v1 = _fit_layer(h1_raw)
    bc1 = df.sparkSession.sparkContext.broadcast((m1, v1))

    def h2_post_bn1(X: np.ndarray) -> np.ndarray:
        W1, b1, W2, b2 = bc.value[0], bc.value[1], bc.value[2], bc.value[3]
        mm, vv = bc1.value
        H1 = np.maximum(X @ W1 + b1, 0.0)
        H1 = (H1 - mm) / np.sqrt(vv + eps)
        return np.maximum(H1 @ W2 + b2, 0.0)

    m2, v2 = _fit_layer(h2_post_bn1)
    return [(m1, v1), (m2, v2)]


class EmbeddingModel:
    """Broadcast-weights batch scorer (V3) + driver-side weight container
    (T5: the reference's state_dict↔ndarray round-trip, :202-210, is just
    'hold the list' here). ``bn`` holds optional inference-mode BatchNorm
    running stats (reference :29-37; see _forward)."""

    def __init__(
        self,
        params: list[np.ndarray],
        bn: list[tuple[np.ndarray, np.ndarray]] | None = None,
    ):
        self.params = params
        self.bn = bn

    @classmethod
    def init(cls, seed: int = 42) -> "EmbeddingModel":
        return cls(_init_params(seed))

    def with_batchnorm(self, df: DataFrame, in_col: str = "features") -> "EmbeddingModel":
        """Return a copy with BatchNorm running stats fit on ``df``."""
        return EmbeddingModel(self.params, fit_batchnorm_stats(self.params, df, in_col))

    def transform_vector(self, vec) -> list[float]:
        return [
            float(x)
            for x in _forward(
                self.params, np.asarray([vec], dtype=np.float64), self.bn
            )[0]
        ]

    def transform(
        self, df: DataFrame, in_col: str = "features", out_col: str = "embedding"
    ) -> DataFrame:
        """Arrow-batched scoring: one matmul per record batch. Weights (and
        BatchNorm stats, when fit) ride a broadcast variable (~180 KB once
        per executor), mirroring the reference's batch forward at :506 but
        distributed."""
        bc = df.sparkSession.sparkContext.broadcast((self.params, self.bn))
        schema = T.StructType(
            df.schema.fields
            + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
        )

        def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            params, bn = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.vstack(pdf[in_col].to_numpy()).astype(np.float64)
                E = _forward(params, X, bn).astype(np.float32)
                pdf = pdf.copy()
                pdf[out_col] = list(E)
                yield pdf

        return df.mapInPandas(score, schema)


def federated_train(
    patients_features: DataFrame,
    *,
    feature_col: str = "features",
    group_col: str = "hospital",
    rounds: int = 3,
    local_epochs: int = 5,
    batch_size: int = 32,
    lr: float = 1e-3,
    seed: int = 42,
    max_rows_per_group: int = 100_000,
) -> EmbeddingModel:
    """FedAvg round loop (reference :436-474, T4). Per round: broadcast
    global params → each hospital group trains locally on its executor
    (applyInPandas) → driver collects (hospital, n, params) rows (3 tiny
    rows, NOT data) → weighted average → next round.

    ``max_rows_per_group``: local training is in-memory per group (exactly
    like one reference client); cap + seeded downsample keeps a 100 TB
    hospital partition from OOMing an executor — the sample is a training
    set, not a query result."""
    spark = patients_features.sparkSession
    out_schema = T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("params", T.BinaryType()),
        ]
    )
    global_params = _init_params(seed)

    for rnd in range(rounds):
        bc = spark.sparkContext.broadcast(pickle.dumps(global_params))

        def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
            X = np.vstack(pdf[feature_col].to_numpy()).astype(np.float64)
            if len(X) > max_rows_per_group:
                rng = np.random.default_rng(seed)
                X = X[rng.choice(len(X), max_rows_per_group, replace=False)]
            start = pickle.loads(bc.value)
            params, _ = train_local(
                start, X, epochs=local_epochs, batch_size=batch_size, lr=lr,
                seed=seed + rnd,
            )
            return pd.DataFrame(
                {
                    group_col: [pdf[group_col].iloc[0]],
                    "n_samples": [len(X)],
                    "params": [pickle.dumps(params)],
                }
            )

        rows = (
            patients_features.select(group_col, feature_col)
            .groupBy(group_col)
            .applyInPandas(fit_group, out_schema)
            .collect()
        )
        global_params = fedavg(
            [(pickle.loads(r["params"]), r["n_samples"]) for r in rows]
        )
    return EmbeddingModel(global_params)
