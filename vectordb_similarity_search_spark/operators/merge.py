"""Keyed MERGE (upsert/delete) into a parquet table — vanilla-Spark
emulation of the lakehouse MERGE INTO.

Plain parquet has no transactional row-level merge (that's what
Delta/Iceberg table formats add); the portable pattern is
read-join-rewrite with a recoverable directory swap:

1. read the current table snapshot,
2. full-outer join target vs updates on the key (updates broadcast when
   small — the common CDC case: a day's changes vs years of history),
3. resolve per row: update wins over target, absent-in-target inserts,
   tombstones delete,
4. write the new snapshot NEXT TO the table and swap it in
   (``util.swap_snapshot``: the previous snapshot is parked and removed
   only after the new one is in place; a crash mid-swap is recovered by
   ``restore_snapshot``, which this writer runs on entry — see its
   docstring for the honest atomicity statement).

Scale notes: the rewrite cost is one pass over the table — that is the
honest floor for format-less parquet; partition the table and merge only
affected partitions to cut it (``partition_by`` + pre-filtering updates'
partitions).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..util import restore_snapshot, swap_snapshot


def merge_parquet(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    *,
    delete_col: str | None = None,
    partition_by: list[str] | None = None,
    broadcast_updates: bool = True,
) -> None:
    """Upsert ``updates`` into the parquet table at ``table_path`` by key.

    ``delete_col``: optional boolean column in ``updates`` marking
    tombstones — matching target rows are removed (and such updates never
    insert). The column itself is not written.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    restore_snapshot(table_path)  # recover a crashed previous swap, if any
    target = spark.read.parquet(table_path)
    data_cols = [c for c in updates.columns if c != delete_col]
    if set(target.columns) != set(data_cols):
        raise ValueError(
            f"updates schema {sorted(data_cols)} != table schema "
            f"{sorted(target.columns)}"
        )

    upd = updates
    if delete_col is None:
        upd = upd.withColumn("_tomb", F.lit(False))
    else:
        upd = upd.withColumn("_tomb", F.coalesce(F.col(delete_col), F.lit(False)))
        upd = upd.drop(delete_col)
    if upd.select(*key_cols).distinct().count() != upd.count():
        raise ValueError("updates carry duplicate keys; resolve before merging")

    u = upd.select(
        *[F.col(k).alias(f"_k_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in data_cols]).alias("_u"),
        "_tomb",
    )
    cond = [target[k].eqNullSafe(u[f"_k_{k}"]) for k in key_cols]
    keep = ~F.coalesce(F.col("_tomb"), F.lit(False))
    if broadcast_updates:
        # target LEFT-joins the broadcast updates — a full_outer join
        # would ignore the broadcast hint and sort-merge the whole table
        # on every merge; inserts come from a keys-only anti-join, so the
        # table's payload never shuffles for the tiny-CDC-batch case.
        joined = target.join(F.broadcast(u), cond, "left")
        updated = (
            joined.filter(keep)
            .select(
                *[
                    F.when(F.col("_u").isNotNull(), F.col("_u")[c])
                    .otherwise(target[c])
                    .alias(c)
                    for c in target.columns
                ]
            )
        )
        tgt_keys = target.select(
            *[F.col(k).alias(f"_tk_{k}") for k in key_cols]
        )
        inserts = (
            upd.filter(~F.col("_tomb"))
            .join(
                tgt_keys,
                [F.col(k).eqNullSafe(F.col(f"_tk_{k}")) for k in key_cols],
                "left_anti",
            )
            .select(*[F.col(c) for c in target.columns])
        )
        merged = updated.unionByName(inserts)
    else:
        # big-batch path: one full_outer shuffle beats the left-join
        # shape's extra table scan + key shuffle when the updates side
        # is too large to broadcast anyway
        joined = target.join(u, cond, "full_outer")
        merged = (
            joined.filter(keep)
            .select(
                *[
                    F.when(F.col("_u").isNotNull(), F.col("_u")[c])
                    .otherwise(target[c])
                    .alias(c)
                    for c in target.columns
                ]
            )
        )

    tmp = f"{table_path.rstrip('/')}__merge_{uuid.uuid4().hex[:8]}"
    w = merged.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    swap_snapshot(table_path, tmp)


def scd2_apply(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    *,
    ts_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    broadcast_updates: bool = True,
) -> None:
    """Slowly-changing-dimension type 2 apply: dimension history as
    immutable versioned rows. The table carries ``valid_from``/``valid_to``
    (NULL valid_to = current row); ``updates`` carries the key, the new
    attribute values and ``ts_col`` (when the change took effect).

    Per key: an update whose attributes DIFFER from the current row closes
    it (valid_to = effective_ts) and inserts a new current row; an update
    equal to the current row is a no-op (idempotent CDC replay); a new key
    inserts its first current row. An update OLDER than the current row's
    valid_from is rejected (stale CDC re-delivery would otherwise install
    old data over newer and write a negative-duration history row).
    History rows are never touched — the rewrite is one pass + swap, same
    recoverable-snapshot discipline as merge_parquet. At scale, partition
    by a key-derived bucket and rewrite only partitions with changes.

    Join shape: current LEFT-joins the (broadcastable) updates for
    close/keep/version, and new keys come from updates ANTI-joined
    against the current KEYS only — so the dimension is never shuffled
    for the common tiny-batch case (a full-outer join would ignore the
    broadcast hint and sort-merge the whole dimension every apply).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    restore_snapshot(table_path)
    target = spark.read.parquet(table_path)
    attr_cols = [
        c
        for c in target.columns
        if c not in (*key_cols, valid_from, valid_to)
    ]
    expect = set(key_cols) | set(attr_cols) | {ts_col}
    if set(updates.columns) != expect:
        raise ValueError(
            f"updates schema {sorted(updates.columns)} != expected {sorted(expect)}"
        )
    if updates.select(*key_cols).distinct().count() != updates.count():
        raise ValueError("one update per key per apply; pre-collapse the batch")

    u = updates.select(
        *[F.col(k).alias(f"_k_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in attr_cols]).alias("_u"),
        F.col(ts_col).alias("_ts"),
    )
    if broadcast_updates:
        u = F.broadcast(u)

    history = target.filter(F.col(valid_to).isNotNull())
    current = target.filter(F.col(valid_to).isNull())
    cond = [current[k].eqNullSafe(u[f"_k_{k}"]) for k in key_cols]
    j = current.join(u, cond, "left")
    changed = F.col("_u").isNotNull() & (
        F.struct(*[current[c] for c in attr_cols]) != F.col("_u")
    )
    stale = j.filter(changed & (F.col("_ts") < current[valid_from]))
    n_stale = stale.count()
    if n_stale:
        raise ValueError(
            f"{n_stale} update(s) are older than the row they would "
            "replace (stale CDC batch); refusing to rewrite history"
        )
    # current rows: closed if changed, kept as-is otherwise
    still = j.select(
        *[current[k].alias(k) for k in key_cols],
        *[current[c].alias(c) for c in attr_cols],
        current[valid_from].alias(valid_from),
        F.when(changed, F.col("_ts")).otherwise(F.lit(None)).alias(valid_to),
    )
    # new versions for changed keys
    versioned = j.filter(changed).select(
        *[F.col(f"_k_{k}").alias(k) for k in key_cols],
        *[F.col("_u")[c].alias(c) for c in attr_cols],
        F.col("_ts").alias(valid_from),
        F.lit(None).cast(target.schema[valid_to].dataType).alias(valid_to),
    )
    # brand-new keys: anti-join against the current KEYS (narrow — the
    # dimension's attribute payload never shuffles here; eqNullSafe to
    # match the join semantics above)
    cur_keys = current.select(
        *[F.col(k).alias(f"_ck_{k}") for k in key_cols]
    )
    new_rows = updates.join(
        cur_keys,
        [
            F.col(k).eqNullSafe(F.col(f"_ck_{k}"))
            for k in key_cols
        ],
        "left_anti",
    ).select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias(valid_from),
        F.lit(None).cast(target.schema[valid_to].dataType).alias(valid_to),
    )
    snapshot = history.unionByName(still).unionByName(versioned).unionByName(
        new_rows
    )

    tmp = f"{table_path.rstrip('/')}__scd2_{uuid.uuid4().hex[:8]}"
    snapshot.write.mode("overwrite").parquet(tmp)
    swap_snapshot(table_path, tmp)
