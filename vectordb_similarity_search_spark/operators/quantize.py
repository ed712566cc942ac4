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
        """Two-phase search: approximate top-``rescore`` over dequantized
        codes (Arrow), exact knn over just those candidates (broadcast
        semi-join into the float table)."""
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

        cand = (
            codes.select(id_col, code_col)
            .mapInPandas(approx, out_schema)
            .orderBy(F.col("_approx").desc(), F.col(id_col).asc())
            .limit(rescore)
        )
        subset = floats.join(F.broadcast(cand.select(id_col)), id_col)
        return knn(subset, list(query_vec), k, id_col=id_col, vec_col=vec_col)


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
