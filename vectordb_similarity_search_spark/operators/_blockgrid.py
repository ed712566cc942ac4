"""Shared block-grid machinery for exact all-pairs embedding operators.

Both ``dedup.embedding_neardup_blocked`` (threshold mining) and
``graph.knn_graph`` (per-source top-k) distribute the same way: every row
gets a stable block id, is replicated to every grid cell its block
touches (shuffle volume N·n_blocks vectors, never N² pairs), and each
cell scores its slab with one float64 BLAS matmul that only SCREENS —
survivors are rescored with the strict left-to-right fold so round-6
scores match the JVM-HOF/DuckDB association bit-for-bit. This module is
the single home of that discipline; the operators own only their
per-cell emission policy (threshold vs top-k).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seq_dot(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise dot with strict left-to-right accumulation over dims
    (the JVM-fold / DuckDB association; np.sum would be pairwise)."""
    acc = A[:, 0] * B[:, 0]
    for d in range(1, A.shape[1]):
        acc = acc + A[:, d] * B[:, d]
    return acc


def grid_replicate(
    df: DataFrame, id_col: str, vec_col: str, n_blocks: int
) -> DataFrame:
    """Replicate each row to every grid cell (ga ≤ gb) its stable block
    ``xxhash64(id) mod n_blocks`` touches. Returns columns
    ``(_id, _v array<double>, _blk, _ga, _gb)``; callers group by
    ``(_ga, _gb)`` and score each cell slab in one Arrow task."""
    rows = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    return rows.select(
        "_id",
        "_v",
        "_blk",
        F.explode(F.array(*[F.lit(j) for j in range(n_blocks)])).alias(
            "_other"
        ),
    ).select(
        "_id",
        "_v",
        "_blk",
        F.least("_blk", "_other").alias("_ga"),
        F.greatest("_blk", "_other").alias("_gb"),
    )
