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


def population_stability(
    ref: DataFrame,
    cur: DataFrame,
    feature,
    *,
    n_bins: int = 8,
    lo: float = -1.0,
    hi: float = 1.0,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    population over one scalar feature — the standard drift monitor
    (PSI < 0.1 stable, > 0.25 shifted; credit-scoring folklore, public).

    ``feature``: a Column expression evaluated on both frames. Fixed
    equal-width bins over [lo, hi] (out-of-range values clamp to the edge
    bins), +1 Laplace smoothing so empty bins never divide by zero, and
    EVERY bin gets a row (an empty bin is signal, not absence — same
    lesson as v_index_stats). Two partial-aggregate counts + an
    ``n_bins``-row join: nothing corpus-sized shuffles.

    Output: ``(bin, n_ref, n_cur, psi_term)``; total PSI = sum(psi_term).
    """
    if n_bins < 2 or not hi > lo:
        raise ValueError("need n_bins >= 2 and hi > lo")
    width = (hi - lo) / n_bins
    spark = ref.sparkSession

    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.least(
            F.greatest(
                F.floor((feature - F.lit(lo)) / F.lit(width)), F.lit(0)
            ),
            F.lit(n_bins - 1),
        ).cast("int")
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(out)
        )
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    counts = (
        bins.join(binned(ref, "n_ref"), "bin", "left")
        .join(binned(cur, "n_cur"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    # totals via window sums over the n_bins-row frame (an agg+crossJoin
    # would re-evaluate both count subtrees — re-scanning both inputs)
    from pyspark.sql import Window as _W

    _w = _W.partitionBy()
    counts = counts.select(
        "bin", "n_ref", "n_cur",
        F.sum("n_ref").over(_w).alias("_tr"),
        F.sum("n_cur").over(_w).alias("_tc"),
    )
    p = (F.col("n_ref") + 1).cast("double") / (F.col("_tr") + n_bins).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / (F.col("_tc") + n_bins).cast("double")
    return (
        counts.select(
            "bin",
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.round((p - q) * (F.log(p) - F.log(q)), 6).alias("psi_term"),
        )
        .orderBy("bin")
    )
