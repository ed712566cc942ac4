"""Declarative data-quality validation: a constraint suite compiled into
ONE aggregate pass.

The public pattern is AWS Deequ / Great Expectations: a pipeline declares
expectations (completeness, uniqueness, ranges, accepted values, row
counts) and the engine verifies them as metrics, not per-row asserts. At
100 TB the design constraint is pass-count: every check below compiles to
an aggregate expression over the SAME single scan (one job, map-side
partial aggregation, one tiny exchange), never one job per check.
``foreign_key`` is the exception by nature — it needs the parent table —
and runs as a second plan (anti-join count) unioned into the same report,
with the parent side broadcast when it is dimension-sized.

Result schema (one row per check, stable across tables):
``(check_name string, violations bigint, passed boolean)`` —
``violations`` is the number of offending rows (or the metric distance
for table-level checks), ``passed`` is ``violations == 0``.

All checks are NULL-explicit: ``in_range``/``values_in`` count NULL as a
violation only if ``allow_null=False`` (completeness is ``not_null``'s
job, so the default leaves NULLs to it — the Deequ convention).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """A named aggregate expression counting violating rows."""

    name: str
    violations: Column


def not_null(col: str) -> Check:
    return Check(
        f"not_null({col})", F.count(F.when(F.col(col).isNull(), 1))
    )


def unique(*cols: str) -> Check:
    """Rows minus distinct key combinations (0 ⇔ key is unique).
    NULL-keyed rows are counted as violations: ``count_distinct`` skips
    them, so any NULL in a declared unique key shows up in the metric —
    uniqueness of a key with NULLs is undefined and should fail loudly."""
    name = f"unique({','.join(cols)})"
    return Check(
        name,
        F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]),
    )


def in_range(
    col: str, lo=None, hi=None, *, allow_null: bool = True
) -> Check:
    if lo is None and hi is None:
        raise ValueError("in_range needs lo and/or hi")
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(col) > F.lit(hi))
    if not allow_null:
        cond = cond | F.col(col).isNull()
    bounds = f"{lo if lo is not None else ''}..{hi if hi is not None else ''}"
    return Check(
        f"in_range({col},{bounds})", F.count(F.when(cond, 1))
    )


def values_in(col: str, allowed: list, *, allow_null: bool = True) -> Check:
    cond = ~F.col(col).isin(allowed)
    if not allow_null:
        cond = cond | F.col(col).isNull()
    else:
        cond = cond & F.col(col).isNotNull()
    return Check(
        f"values_in({col})", F.count(F.when(cond, 1))
    )


def row_count_between(lo: int, hi: int | None = None) -> Check:
    """Table-level check; ``violations`` is the distance outside the
    accepted band (0 when inside)."""
    n = F.count(F.lit(1))
    below = F.when(n < F.lit(lo), F.lit(lo) - n).otherwise(F.lit(0))
    above = (
        F.when(n > F.lit(hi), n - F.lit(hi)).otherwise(F.lit(0))
        if hi is not None
        else F.lit(0)
    )
    return Check(f"row_count_between({lo},{hi})", below + above)


def check_suite(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run every check in ONE aggregate job over one scan of ``df``."""
    if not checks:
        raise ValueError("no checks given")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    one = df.agg(
        *[c.violations.cast("long").alias(f"_v_{i}") for i, c in enumerate(checks)]
    )
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c.name).alias("check_name"),
                        F.col(f"_v_{i}").alias("violations"),
                        (F.col(f"_v_{i}") == 0).alias("passed"),
                    )
                    for i, c in enumerate(checks)
                ]
            )
        ).alias("r")
    ).select("r.check_name", "r.violations", "r.passed")


def foreign_key(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    *,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential-integrity check: count child rows whose non-NULL ``fk``
    has no match in ``parent[pk]`` (NULL fks are ``not_null``'s concern).
    Same report schema as ``check_suite`` — union them into one report.

    ``broadcast_parent=True`` is right when the parent is a dimension;
    for fact-sized parents set it False and let AQE pick the join."""
    keys = parent.select(F.col(pk).alias(fk)).dropDuplicates([fk])
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = (
        child.where(F.col(fk).isNotNull())
        .join(keys, on=fk, how="left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    return orphans.select(
        F.lit(f"foreign_key({fk})").alias("check_name"),
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )
