"""Vector math as native Spark column expressions (higher-order functions).

This is the engine's version of the reference's brute-force cosine kernel
(`sklearn.cosine_similarity` over an in-memory matrix,
similarity_search.py:300-305).  We express dot/norm/cosine with
``zip_with`` + ``aggregate`` so the whole computation stays JVM-side inside
Catalyst (no Python round-trip, fully codegen-able, pushdown-friendly) and
scales linearly with partitioned scans instead of requiring a single dense
matrix in one process's RAM.

All kernels cast to ``array<double>`` first so results are deterministic and
bit-comparable with the DuckDB oracle (which also computes in double after a
``CAST(x AS DOUBLE[])``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def array_lit(vec) -> Column:
    """A literal array<double> column for a driver-side query vector.

    Mirrors the reference's broadcast of the embedded query
    (similarity_search.py:332-334) — a constant folded into the plan, shipped
    once per executor with the task binary, never shuffled.
    """
    return F.array(*[F.lit(float(x)) for x in vec]).cast("array<double>")


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Sequential left-to-right fold — matches DuckDB list ops' order.

    Measured guidance (sf0.1, 2M pairs, dim 64): the HOF fold with
    PRECOMPUTED norms is the fast JVM form (~9 s); passing ``dim`` unrolls
    into a 64-term element_at chain that is bit-identical but ~2x SLOWER —
    the giant generated method blows the JIT inlining budget and runs as
    interpreted bytecode. Leave ``dim`` unset unless profiling says
    otherwise; the true scale path for massive pair counts is the
    numpy-blocked scorer (operators/topk.similarity_join_blocked)."""
    if dim is not None:
        a = F.col(a) if isinstance(a, str) else a
        b = F.col(b) if isinstance(b, str) else b
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast(
                "double"
            )
        return acc
    a, b = to_double_array(a), to_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine_similarity(
    a: Column | str, b: Column | str, dim: int | None = None
) -> Column:
    """cos(a,b) = a·b / (|a||b|) — the reference's core scoring kernel
    (similarity_search.py:302). NULL when either vector is zero (cosine is
    undefined there; ANSI mode would otherwise raise DIVIDE_BY_ZERO). The
    non-zero path's arithmetic is unchanged, preserving oracle bit-parity."""
    denom = l2_norm(a, dim) * l2_norm(b, dim)
    return F.when(denom != 0.0, dot(a, b, dim) / denom)


def l2_distance(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    if dim is not None:
        a = F.col(a) if isinstance(a, str) else a
        b = F.col(b) if isinstance(b, str) else b
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            d = F.element_at(a, i).cast("double") - F.element_at(b, i).cast("double")
            acc = acc + d * d
        return F.sqrt(acc)
    a, b = to_double_array(a), to_double_array(b)
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def row_zscore_normalize(a: Column | str, eps: float = 1e-8) -> Column:
    """Per-row z-score across a vector's own components — bug-compatible
    mirror of the reference's query-path normalization
    (similarity_search.py:576), which normalizes the query row against
    ITSELF instead of the training statistics (train/serve skew; SURVEY.md
    §2.4 V2). Provided for migration parity only — new code should use
    ``operators.cohort.zscore_params``/``zscore_vector`` (stored stats)."""
    a = to_double_array(a)
    n = F.size(a)
    mu = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x) / n
    var = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + (x - mu) * (x - mu)) / n
    sd = F.sqrt(var) + F.lit(eps)
    return F.transform(a, lambda x: (x - mu) / sd)


def l2_normalize(a: Column | str, eps: float = 0.0) -> Column:
    """Unit-normalize a vector column. The reference z-scores per-row at query
    time (similarity_search.py:576 — a train/serve skew bug we do NOT copy;
    see SURVEY.md §2.4 V2). Unit-norm here is the standard cosine prep.

    Zero vectors are returned unchanged (no direction to normalize to) —
    unguarded, ANSI mode raises DIVIDE_BY_ZERO on a single zero row."""
    a = to_double_array(a)
    n = l2_norm(a) + F.lit(eps)
    return F.when(n != 0.0, F.transform(a, lambda x: x / n)).otherwise(a)
