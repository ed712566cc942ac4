"""Table profiling: per-column statistics in ONE pass over the data — the
engine's ANALYZE TABLE. The reference has no profiling at all (its
"stats" are the hand-rolled per-query aggregates, similarity_search.py:
366-407); a 100 TB pipeline needs column null-rates and cardinalities
BEFORE deciding join strategies, partition keys, and dedup columns.

Plan shape: a single aggregate row computes count / null-count /
distinct-count for every column at once, then explodes to one row per
column (stack). The scan runs ONCE either way; the mode choice is about
the aggregate:
- ``approx=True`` (the 100 TB default): approx_count_distinct (HLL) per
  column — all partial aggregates are tiny sketches, one reduce, no
  expand.
- ``approx=False`` (exact, small tables / oracle checking): Spark plans
  multi-column count(DISTINCT) via EXPAND — the input is replicated
  once per profiled column before the shuffle. Exact cardinality on N
  columns fundamentally costs N distinct-aggregations; use the HLL mode
  when N·rows is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_nulls, n_distinct)``,
    one row per profiled column, one scan of the input. ``rsd`` is the
    HLL relative error when ``approx=True`` (ignored otherwise).
    NULLs are not counted in ``n_distinct`` (both modes)."""
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    if not cols:
        raise ValueError("no columns to profile")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate columns: {sorted(set(c for c in cols if cols.count(c) > 1))}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nn_{c}"))
        aggs.append(
            (
                F.approx_count_distinct(c, rsd=rsd)
                if approx
                else F.count_distinct(F.col(c))
            ).alias(f"_nd_{c}")
        )
    one = df.agg(*aggs)
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("_n").alias("n_rows"),
                        F.col(f"_nn_{c}").alias("n_nulls"),
                        F.col(f"_nd_{c}").alias("n_distinct"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.column", "p.n_rows", "p.n_nulls", "p.n_distinct")
