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


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-to-right fold — matches DuckDB list_dot_product order."""
    a, b = to_double_array(a), to_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = a·b / (|a||b|) — the reference's core scoring kernel
    (similarity_search.py:302)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = to_double_array(a), to_double_array(b)
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def l2_normalize(a: Column | str, eps: float = 0.0) -> Column:
    """Unit-normalize a vector column. The reference z-scores per-row at query
    time (similarity_search.py:576 — a train/serve skew bug we do NOT copy;
    see SURVEY.md §2.4 V2). Unit-norm here is the standard cosine prep."""
    a = to_double_array(a)
    n = l2_norm(a) + F.lit(eps)
    return F.transform(a, lambda x: x / n)
