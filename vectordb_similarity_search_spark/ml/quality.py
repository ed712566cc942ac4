"""Trained document-quality classifier: hashed-n-gram logistic regression
(the fastText / CCNet-style model real pipelines train to score web text
against a trusted reference corpus — Joulin et al. 2016, Wenzek et al.
2019; absent from the reference, whose only text signal is heuristic).

Spark-first design, sized for 100 TB:
- featurization is a deterministic hashed bag of word uni+bigrams
  (crc32 → dim buckets, L1-normalized counts) computed inside Arrow
  batches — no vocabulary build, no shuffle, memory O(dim);
- each full-batch GD iteration is ONE job: an Arrow pass emits per-batch
  partial gradients, a posexplode + groupBy(pos) SUM reduces them to
  ``dim`` rows (the only shuffle: #batches × dim tiny rows), and the
  driver takes one O(dim) step;
- scoring broadcasts the weight vector and runs one Arrow pass.

Bit-determinism across partitionings (stronger than ml/pca's sorted
driver reduce): every per-document gradient contribution is QUANTIZED to
int64 (``round(g * scale)``) before any summation, so the reduction is
exact integer arithmetic — associative and commutative — and the fitted
weights are bit-identical under any partitioning, core count, or AQE
re-plan. ``scale`` auto-shrinks as ``min(2**24, 2**62 // n)`` so the
worst-case |Σ| bound ``n · scale`` cannot overflow int64 even at
trillions of documents (ANSI mode would throw, not wrap, if it did).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN_RE = r"[a-z0-9]+"


def _hash_tokens(text: str, dim: int) -> np.ndarray:
    """L1-normalized hashed uni+bigram counts + trailing bias slot."""
    import re

    toks = re.findall(_TOKEN_RE, text.lower()) if text else []
    x = np.zeros(dim + 1, dtype=np.float64)
    for t in toks:
        x[zlib.crc32(t.encode()) % dim] += 1.0
    for a, b in zip(toks, toks[1:]):
        x[zlib.crc32(f"{a} {b}".encode()) % dim] += 1.0
    total = x.sum()
    if total > 0.0:
        x /= total
    x[dim] = 1.0  # bias
    return x


@dataclass(frozen=True)
class QualityModel:
    weights: np.ndarray  # dim+1 (bias last)
    dim: int

    def predict_one(self, text: str) -> float:
        z = float(self._sigmoid(self.weights @ _hash_tokens(text, self.dim)))
        return z

    @staticmethod
    def _sigmoid(z):
        return 1.0 / (1.0 + np.exp(-np.clip(z, -30.0, 30.0)))


def fit_quality_classifier(
    docs: DataFrame,
    label_col: str,
    *,
    text_col: str = "text",
    dim: int = 4096,
    iters: int = 30,
    lr: float = 0.1,
    l2: float = 1e-6,
    n_docs: int | None = None,
) -> QualityModel:
    """Full-batch logistic regression on hashed n-gram features, Adam
    driver updates (same optimizer family as ml/embed — plain GD needs
    ~100x the iterations on these L1-normalized features, and every
    iteration is a cluster job, so optimizer choice IS a scale choice).

    ``label_col``: numeric/boolean column (1 = reference/"good" class).
    One Spark job per iteration (``iters`` total) — an offline training
    operator like ml/embed.federated_train, not a query-path op.
    ``n_docs`` skips the initial count when the caller already knows it.
    """
    sc = docs.sparkSession.sparkContext
    base = docs.select(
        F.col(text_col).alias("_text"),
        F.col(label_col).cast("double").alias("_y"),
    )
    n = int(base.count()) if n_docs is None else int(n_docs)
    if n == 0:
        raise ValueError("empty training set")
    scale = float(min(2**24, (2**62) // max(n, 1)))
    w = np.zeros(dim + 1, dtype=np.float64)
    m_t = np.zeros_like(w)
    v_t = np.zeros_like(w)
    b1, b2, eps = 0.9, 0.999, 1e-8

    grad_schema = T.StructType(
        [
            T.StructField("pos", T.IntegerType()),
            T.StructField("gq", T.LongType()),
        ]
    )

    for step in range(1, iters + 1):
        bc_w = sc.broadcast(w)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            wv = bc_w.value
            d = wv.shape[0] - 1
            for pdf in batches:
                if pdf.empty:
                    continue
                acc = np.zeros(d + 1, dtype=np.int64)
                for text, y in zip(pdf["_text"], pdf["_y"]):
                    x = _hash_tokens(text, d)
                    err = QualityModel._sigmoid(wv @ x) - float(y)
                    # quantize the per-DOC contribution, then exact int sum
                    acc += np.rint(err * x * scale).astype(np.int64)
                nz = np.nonzero(acc)[0]
                yield pd.DataFrame(
                    {"pos": nz.astype(np.int32), "gq": acc[nz]}
                )

        try:
            rows = (
                base.mapInPandas(partials, grad_schema)
                .groupBy("pos")
                .agg(F.sum("gq").alias("gq"))
                .collect()
            )
        finally:
            bc_w.destroy()  # don't leak the broadcast on a failed job
        g = np.zeros(dim + 1, dtype=np.float64)
        for r in rows:
            g[r["pos"]] = r["gq"] / scale
        g = g / n + l2 * w
        m_t = b1 * m_t + (1.0 - b1) * g
        v_t = b2 * v_t + (1.0 - b2) * g * g
        mh = m_t / (1.0 - b1**step)
        vh = v_t / (1.0 - b2**step)
        w = w - lr * mh / (np.sqrt(vh) + eps)
    return QualityModel(weights=w, dim=dim)


def score_quality(
    df: DataFrame,
    model: QualityModel,
    *,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append the model's P(reference-class) — one broadcast Arrow pass."""
    sc = df.sparkSession.sparkContext
    bc_w = sc.broadcast(model.weights)
    dim = model.dim
    fields = df.schema.fields + [T.StructField(out_col, T.DoubleType())]
    out_schema = T.StructType(fields)
    cols = df.columns

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wv = bc_w.value
        for pdf in batches:
            if pdf.empty:
                continue
            probs = [
                float(QualityModel._sigmoid(wv @ _hash_tokens(t, dim)))
                for t in pdf[text_col]
            ]
            out = pdf[cols].copy()
            out[out_col] = probs
            yield out

    return df.mapInPandas(score, out_schema)


def nb_quality_log_odds(
    docs: DataFrame,
    label_col: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial Naive Bayes quality classifier — closed form, ONE
    distributed count pass (the classic fastText-comparable baseline;
    at 100 TB this, not iterative GD, is what you train first).

    Returns ``(id_col, label int, nb_log_odds double)`` per document:
    ``ln P(doc|good)/P(doc|bad) + ln P(good)/P(bad)`` under Laplace
    smoothing. Plan: explode tokens → ONE (token, class-count) aggregate
    (partial agg absorbs the explosion; the shuffle moves vocab-sized
    rows) → per-token log-ratio weights broadcast back onto the token
    stream → per-doc sum. Fully lazy, no driver loop.

    Determinism: the sufficient statistics are INTEGER counts (exact,
    order-independent by construction); log-weights are rounded to 9
    decimals and summed as DECIMAL — exact decimal addition, so the
    per-doc score is bit-identical under any partitioning AND mirrors a
    SQL twin shape-for-shape (the t_nb_quality oracle).
    """
    lab = docs.select(
        id_col,
        F.col(label_col).cast("int").alias("_y"),
        F.col(text_col).alias("_text"),
    )
    tok = lab.select(
        id_col, "_y", F.explode(F.split("_text", r"\s+")).alias("tok")
    )
    cnt = tok.groupBy("tok").agg(
        F.sum(F.when(F.col("_y") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("_y") == 0, 1).otherwise(0)).alias("c0"),
    )
    # corpus totals as WINDOW sums over the vocab-sized count frame — an
    # agg + crossJoin here would re-evaluate cnt (and so re-scan + re-
    # explode the corpus) once per reference; the window pays one
    # single-partition exchange of vocab rows instead (integer sums, so
    # the values are bit-identical either way)
    from pyspark.sql import Window as _W

    _w = _W.partitionBy()
    cnt = cnt.select(
        "tok", "c1", "c0",
        F.sum("c1").over(_w).alias("n1"),
        F.sum("c0").over(_w).alias("n0"),
        F.count(F.lit(1)).over(_w).alias("v"),
    )
    w = cnt.select(
        "tok",
        F.round(
            F.log((F.col("c1") + 1).cast("double") / (F.col("n1") + F.col("v")).cast("double"))
            - F.log((F.col("c0") + 1).cast("double") / (F.col("n0") + F.col("v")).cast("double")),
            9,
        )
        .cast("decimal(24,9)")
        .alias("wd"),
    )
    # Degenerate single-class training data would make the prior ln(x/0) =
    # Inf and every score garbage; raise AT EXECUTION (the build must stay
    # zero-job) instead of emitting Inf silently.
    pri = lab.agg(
        F.sum("_y").alias("_d1"), F.sum(1 - F.col("_y")).alias("_d0")
    ).select(
        F.when(
            (F.col("_d1") > 0) & (F.col("_d0") > 0),
            F.log(F.col("_d1").cast("double") / F.col("_d0").cast("double")),
        )
        .otherwise(
            F.raise_error(
                F.lit("nb_quality_log_odds: training labels are single-class")
            )
        )
        .alias("prior")
    )
    sc = (
        tok.join(F.broadcast(w), "tok")
        .groupBy(id_col)
        .agg(F.sum("wd").alias("s"))
    )
    return (
        sc.join(lab.select(id_col, "_y"), id_col)
        .crossJoin(F.broadcast(pri))
        .select(
            id_col,
            F.col("_y").alias("label"),
            (F.col("s").cast("double") + F.col("prior")).alias("nb_log_odds"),
        )
    )
