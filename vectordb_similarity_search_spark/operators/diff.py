"""Keyed table diff / reconciliation.

The data-regression primitive (dbt-audit-helper / Datafold lineage):
given two versions of a keyed table — yesterday's snapshot vs today's,
the legacy pipeline's output vs the rewrite's — classify every key as
added / removed / changed / same and count which columns changed. This
is how a 100 TB migration proves "the rewrite produces the same table"
without eyeballing rows.

Scale shape: ONE full-outer sort-merge join on the key columns (the
correct plan for big-to-big reconciliation — note Spark ignores
broadcast hints on full_outer, ROUND_NOTES round-3; both sides shuffle
once on the keys and stream merge). Row equality is decided by
comparing values column-wise with NULL-safe equality (`eqNullSafe`) —
no row serialization, no Python. The per-column change counts ride the
same aggregate pass over the diff frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    *,
    status_col: str = "_diff_status",
) -> DataFrame:
    """Row-level diff of two keyed tables.

    Returns one row per key present in either side: the key columns,
    ``<col>_l`` / ``<col>_r`` for every non-key column, and
    ``status_col`` in {'added', 'removed', 'changed', 'same'} ('added'
    = key only in ``right``). Key columns must identify rows uniquely
    on each side — duplicate keys raise at execution (a diff over
    ambiguous keys would pair rows arbitrarily), checked lazily inside
    the plan via a window count so the validation rides the same
    key-partitioned exchange the join pays for.
    """
    if not keys:
        raise ValueError("table_diff requires key columns")
    val_cols = [c for c in left.columns if c not in keys]
    if set(left.columns) != set(right.columns):
        raise ValueError(
            f"schemas differ: {sorted(left.columns)} vs {sorted(right.columns)}"
        )

    from pyspark.sql import Window

    def tag(df: DataFrame, side: str) -> DataFrame:
        w = Window.partitionBy(*keys)
        cnt = F.count("*").over(w)
        dup_guard = F.when(
            cnt == 1, F.lit(1)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"table_diff: duplicate key on {side} side: "),
                    F.concat_ws(
                        "/", *[F.col(k).cast("string") for k in keys]
                    ),
                )
            )
        )
        return df.select(
            *keys,
            *[F.col(c).alias(f"{c}_{side[0]}") for c in val_cols],
            dup_guard.alias(f"_ok_{side[0]}"),
        )

    joined = tag(left, "left").join(tag(right, "right"), keys, "full_outer")
    row_same = (
        F.lit(True)
        if not val_cols
        else F.expr(
            " AND ".join(f"(`{c}_l` <=> `{c}_r`)" for c in val_cols)
        )
    )
    status = (
        F.when(F.col("_ok_l").isNull(), F.lit("added"))
        .when(F.col("_ok_r").isNull(), F.lit("removed"))
        .when(row_same, F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return joined.withColumn(status_col, status).drop("_ok_l", "_ok_r")


def diff_summary(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
) -> DataFrame:
    """One-pass reconciliation report over :func:`table_diff`: a row per
    status with its key count, plus — for 'changed' — one row per value
    column that differs, with the number of keys where it differs.
    Returns (metric, n): the four ``rows_*`` metrics first, then
    ``col_changed_<col>`` in the table's column order; the whole report
    is one aggregate over the diff frame (single action at 100 TB)."""
    val_cols = [c for c in left.columns if c not in keys]
    d = table_diff(left, right, keys)
    changed = F.col("_diff_status") == "changed"
    aggs = [
        F.sum((F.col("_diff_status") == s).cast("long")).alias(f"rows_{s}")
        for s in ("added", "removed", "changed", "same")
    ] + [
        F.sum(
            (changed & ~F.col(f"{c}_l").eqNullSafe(F.col(f"{c}_r"))).cast(
                "long"
            )
        ).alias(f"col_changed_{c}")
        for c in val_cols
    ]
    wide = d.agg(*aggs)
    metrics = [f"rows_{s}" for s in ("added", "removed", "changed", "same")]
    metrics += [f"col_changed_{c}" for c in val_cols]
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("metric"), F.col(m).alias("n")
                    )
                    for m in metrics
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.metric", F.col("s.n").cast("long").alias("n"))
