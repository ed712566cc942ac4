"""Scalar (int8) vector quantization with exact rescore.

The memory lever of a vector store: float32 embeddings → per-dimension
affine int8 codes (4x smaller; at 100 TB of vectors that is the
difference between an index that fits the cluster's page cache and one
that doesn't). Search runs two-phase: approximate top-C on dequantized
codes (cheap, bounded error), exact rescore of the C candidates against
the original vectors (touches C rows, not N). Public technique (the SQ8
of FAISS et al.).

Spark shape: the quantizer bounds come from one tiny aggregate (per-dim
min/max via array-position aggregates); encode/decode are Arrow batch
passes; candidate rescore joins C ids back to the float table — broadcast
when C is small.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .topk import knn


class Sq8Model:
    """Per-dimension affine quantizer: code = round((x - lo) / scale),
    clipped to [0, 255]; decode = lo + code·scale."""

    def __init__(self, lo: np.ndarray, scale: np.ndarray):
        self.lo = lo
        self.scale = scale

    def encode(self, df: DataFrame, vec_col: str = "embedding",
               code_col: str = "code") -> DataFrame:
        bc = df.sparkSession.sparkContext.broadcast((self.lo, self.scale))
        schema = T.StructType(
            [f for f in df.schema.fields if f.name != vec_col]
            + [T.StructField(code_col, T.BinaryType())]
        )

        def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            lo, scale = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                codes = np.clip(np.rint((X - lo) / scale), 0, 255).astype(np.uint8)
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
        code_col: str = "code",
    ) -> DataFrame:
        """Approximate top-``depth`` candidates (id, _approx) over the
        dequantized codes — the screen half of :meth:`search`, exposed so
        recall audits (v_recall_matrix) can measure candidate quality."""
        bc = codes.sparkSession.sparkContext.broadcast(
            (self.lo, self.scale, np.asarray(query_vec, dtype=np.float64))
        )
        out_schema = T.StructType(
            [codes.schema[id_col], T.StructField("_approx", T.DoubleType())]
        )

        def approx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            lo, scale, q = bc.value
            qn = q / np.linalg.norm(q)
            for pdf in batches:
                if pdf.empty:
                    continue
                C = np.vstack(
                    [np.frombuffer(b, dtype=np.uint8) for b in pdf[code_col]]
                ).astype(np.float64)
                X = lo + C * scale
                norms = np.linalg.norm(X, axis=1)
                norms[norms == 0.0] = 1.0
                s = (X / norms[:, None]) @ qn
                yield pd.DataFrame({id_col: pdf[id_col], "_approx": s})

        return (
            codes.select(id_col, code_col)
            .mapInPandas(approx, out_schema)
            .orderBy(F.col("_approx").desc(), F.col(id_col).asc())
            .limit(depth)
        )

    def search(
        self,
        codes: DataFrame,
        floats: DataFrame,
        query_vec: Sequence[float],
        k: int = 10,
        *,
        rescore: int = 50,
        id_col: str = "vec_id",
        code_col: str = "code",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Two-phase search: approximate top-``rescore`` screen (Arrow),
        exact knn over just those candidates (broadcast semi-join into
        the float table)."""
        cand = self.screen(
            codes, query_vec, rescore, id_col=id_col, code_col=code_col
        )
        subset = floats.join(F.broadcast(cand.select(id_col)), id_col)
        return knn(subset, list(query_vec), k, id_col=id_col, vec_col=vec_col)


class BqModel:
    """Thermometer-coded binary quantizer: each dimension is cut by L
    per-dim quantile thresholds into L+1 levels, encoded UNARY (bit l of
    dim j is set iff x[j] > threshold[l][j]) and packed into int64 words.

    The unary coding is the point: Hamming distance between thermometer
    codes EQUALS the L1 distance between quantized levels, so a plain
    ``bit_count(code XOR query_code)`` — a pure JVM whole-stage-codegen
    expression over packed longs, zero Python, zero floats — ranks
    candidates by a real geometric distance, not a sign sketch. At L=3
    that is 3 bits/dim: ~10.7x smaller than float32, and the screen's
    shuffle carries only (id, small-int distance). The "binary
    quantization" tier of Milvus/Qdrant lineage, with the thermometer
    trick lifting 1-bit sign recall to 2-bit-level recall.

    Search keeps the repo's quantized-search contract: approximate
    Hamming screen to top-C, exact float rescore of the C candidates,
    served top-k EXACT (tests/test_quantize.py pins the screen-depth
    margin at >=2x on every fixture sf).
    """

    def __init__(self, thresholds: np.ndarray):
        # (L, dim): thresholds[l][j] cuts level l of dimension j
        self.thresholds = np.asarray(thresholds, dtype=np.float64)
        if self.thresholds.ndim != 2:
            raise ValueError("thresholds must be (levels, dim)")
        self.levels, self.dim = self.thresholds.shape
        self.n_bits = self.levels * self.dim
        self.n_words = (self.n_bits + 63) // 64

    def _pack(self, X: np.ndarray) -> np.ndarray:
        """(n, dim) floats -> (n, n_words) int64 thermometer words. Bit
        (j*L + l) of the flat code = x[j] > thresholds[l][j]; tail bits of
        the last word stay 0."""
        # (n, L, dim) -> (n, dim, L) -> (n, dim*L), dim-major so each
        # dimension's unary run is contiguous
        bits = (
            (X[:, None, :] > self.thresholds[None, :, :])
            .transpose(0, 2, 1)
            .reshape(X.shape[0], self.n_bits)
            .astype(np.uint64)
        )
        words = np.zeros((X.shape[0], self.n_words), dtype=np.uint64)
        for b in range(self.n_bits):
            words[:, b // 64] |= bits[:, b] << np.uint64(b % 64)
        return words.view(np.int64)

    def encode_vec(self, q: Sequence[float]) -> list[int]:
        return [
            int(w)
            for w in self._pack(np.asarray(q, dtype=np.float64)[None, :])[0]
        ]

    def encode(self, df: DataFrame, vec_col: str = "embedding",
               code_col: str = "bq") -> DataFrame:
        bc = df.sparkSession.sparkContext.broadcast(self.thresholds)
        schema = T.StructType(
            [f for f in df.schema.fields if f.name != vec_col]
            + [T.StructField(code_col, T.ArrayType(T.LongType()))]
        )

        def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            model = BqModel(bc.value)
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                out = pdf.drop(columns=[vec_col]).copy()
                out[code_col] = list(model._pack(X))
                yield out

        return df.mapInPandas(enc, schema)

    def hamming_to(self, code_col: str, query_vec: Sequence[float]):
        """JVM Hamming-distance expression between a packed code column and
        the query's packed words — ``aggregate(zip_with(code, qwords,
        bit_count(xor)))``. One xor+popcount per 64 bits, all codegen; by
        the thermometer identity this IS the L1 level distance."""
        qwords = F.array(*[F.lit(w) for w in self.encode_vec(query_vec)])
        return F.aggregate(
            F.zip_with(
                F.col(code_col),
                qwords,
                lambda a, b: F.bit_count(a.bitwiseXOR(b)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )

    def screen(
        self,
        codes: DataFrame,
        query_vec: Sequence[float],
        depth: int,
        *,
        id_col: str = "vec_id",
        code_col: str = "bq",
    ) -> DataFrame:
        """Hamming top-``depth`` candidates (id, _ham) — JVM expression +
        TakeOrderedAndProject (per-partition top-C, C-row merge)."""
        return (
            codes.select(
                id_col, self.hamming_to(code_col, query_vec).alias("_ham")
            )
            .orderBy(F.col("_ham").asc(), F.col(id_col).asc())
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
        code_col: str = "bq",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Two-phase search: Hamming screen, exact knn over just those
        candidates (broadcast semi-join)."""
        cand = self.screen(
            codes, query_vec, rescore, id_col=id_col, code_col=code_col
        )
        subset = floats.join(F.broadcast(cand.select(id_col)), id_col)
        return knn(subset, list(query_vec), k, id_col=id_col, vec_col=vec_col)


def fit_bq(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    *,
    levels: int = 3,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> tuple[BqModel, int]:
    """Per-dim quantile thresholds (levels cuts at 1/(L+1) .. L/(L+1))
    from one aggregate over one scan. Exact ``F.percentile`` keeps the
    fit a pure content function of the corpus (layout-independent),
    BUT — unlike fit_sq8's constant-state min/max — it buffers one
    (value, count) entry per DISTINCT value per dimension, so over
    continuous embeddings the aggregate state is O(rows x dims). Fine at
    fixture/model-build scale; at a 100 TB corpus pass
    ``sample_fraction``: thresholds then fit on a CONTENT-KEYED hash
    sample (xxhash64 of the vector bytes — still layout-independent and
    replayable) folded into the same single-scan aggregate via
    ``when(bucket < cutoff, elem)``, bounding percentile state by the
    sample while the returned corpus count stays exact. Quantiles of a
    few-percent sample are well within the screen's >=2x depth margin —
    thresholds are model parameters, and the served top-k is exact by
    the rescore contract regardless.

    Returns (model, corpus_count): the count rides the same aggregate
    job and lets callers size the screen depth without a second scan."""
    if dim is None:
        dim = len(df.select(vec_col).head()[0])
    elem = lambda j: F.element_at(vec_col, j + 1)  # noqa: E731
    if sample_fraction is not None:
        if not (0.0 < sample_fraction <= 1.0):
            raise ValueError(
                f"sample_fraction must be in (0, 1], got {sample_fraction}"
            )
        cutoff = int(sample_fraction * 1_000_000)
        bucket = F.pmod(
            F.xxhash64(F.col(vec_col), F.lit(seed)), F.lit(1_000_000)
        )
        base = elem
        elem = lambda j: F.when(bucket < cutoff, base(j))  # noqa: E731
    ps = F.array(*[F.lit((l + 1) / (levels + 1)) for l in range(levels)])
    row = df.agg(
        F.count("*").alias("_n"),
        *[F.percentile(elem(j), ps).alias(f"t{j}") for j in range(dim)],
    ).head()
    thr = np.array([row[f"t{j}"] for j in range(dim)], dtype=np.float64).T
    return BqModel(thr), int(row["_n"])


def fit_sq8(df: DataFrame, vec_col: str = "embedding", dim: int | None = None) -> Sq8Model:
    """Per-dim min/max from one aggregate over zipped array positions.

    Pass ``dim`` when known (it always is in a real pipeline): omitting it
    costs one extra driver probe job (a ``head()`` to measure the first
    vector) before the aggregate — the same query-parameter-lookup class
    the catalog memoizes elsewhere."""
    if dim is None:
        dim = len(df.select(vec_col).head()[0])
    row = df.agg(
        *[F.min(F.element_at(vec_col, i + 1)).alias(f"lo{i}") for i in range(dim)],
        *[F.max(F.element_at(vec_col, i + 1)).alias(f"hi{i}") for i in range(dim)],
    ).head()
    lo = np.array([row[f"lo{i}"] for i in range(dim)], dtype=np.float64)
    hi = np.array([row[f"hi{i}"] for i in range(dim)], dtype=np.float64)
    scale = (hi - lo) / 255.0
    scale[scale == 0.0] = 1.0  # constant dims encode to 0 and decode to lo
    return Sq8Model(lo, scale)
