"""Continuous vector ingest: a Structured Streaming feed into the written
IVF index (operators/ann.py) — the streaming half of the vector-store
lifecycle. The reference rebuilds its whole in-memory store per arriving
batch (similarity_search.py:275-292); here each micro-batch appends
parquet files only under the cells its vectors land in, so the index
stays serveable during ingest and the per-batch cost is O(batch), not
O(store).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.ann import IvfModel, ivf_append, ivf_compact, ivf_delete


def vector_ingest_stream(
    vectors: DataFrame,
    model: IvfModel,
    index_path: str,
    checkpoint_dir: str,
    *,
    id_col: str = "vec_id",
    delete_col: str | None = None,
    compact_every: int | None = None,
    target_rows_per_file: int = 1_000_000,
):
    """foreachBatch ingest of a vector CDC feed into a written IVF index.

    Per micro-batch:
    - rows flagged by ``delete_col`` (when given) become tombstones
      (:func:`ivf_delete` — O(batch) append, no index file touched);
    - remaining rows are cell-assigned under the FROZEN centroids and
      appended only under the touched cells (:func:`ivf_append`);
    - every ``compact_every``-th batch id triggers
      :func:`ivf_compact`, bounding small-file growth and GC-ing
      tombstones — probes between compactions pay one broadcast
      anti-join against the (delete-traffic-bounded) tombstone set.

    Contract (the index's single-version rule, operators/ann.ivf_delete):
    the feed may INSERT new ids and DELETE existing ids. A batch carrying
    both a delete and an insert for the same id is ambiguous under
    tombstone semantics and is REJECTED (batch-local check — no table
    scan); updating a vector in place is delete → compact → re-insert,
    or rebuild offline. Re-fitting centroids on drift is likewise an
    offline rebuild under a new path.

    Replay safety: an append is NOT idempotent (a replayed batch would
    duplicate ids), so applied batches are recorded in a ledger —
    ``<index>__applied/<batch_id>`` marker files, same protocol and same
    honest crash window as ``rollup_ingest_stream`` (dying between the
    append and the marker write duplicates that one batch; closing it
    needs a transactional table format). The ledger lives OUTSIDE the
    index directory so compaction's snapshot swap never touches it.
    """
    ledger = f"{index_path.rstrip('/')}__applied"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger, str(batch_id))
        if os.path.exists(marker):
            return  # replayed batch: already ingested
        spark = batch_df.sparkSession
        batch = batch_df
        if delete_col is not None:
            flagged = batch.filter(F.col(delete_col))
            batch = batch.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
            dead = [r[0] for r in flagged.select(id_col).collect()]
            if dead:
                live_ids = {
                    r[0]
                    for r in batch.select(id_col)
                    .filter(F.col(id_col).isin(dead))
                    .collect()
                }
                if live_ids:
                    raise ValueError(
                        f"batch {batch_id} both deletes and inserts ids "
                        f"{sorted(live_ids)[:5]}… — in-place update is not "
                        "expressible with tombstones; delete, compact, then "
                        "re-insert"
                    )
                ivf_delete(spark, index_path, dead, id_col=id_col)
        if not batch.isEmpty():
            ivf_append(model, batch, index_path)
        # cadence keys off the DURABLE batch_id (monotonic across stream
        # restarts via the checkpoint), not a process-local counter — a
        # crash-looping stream must still reach its compactions
        if compact_every and batch_id % compact_every == compact_every - 1:
            ivf_compact(
                spark, index_path, id_col=id_col,
                target_rows_per_file=target_rows_per_file,
            )
        os.makedirs(ledger, exist_ok=True)
        with open(marker, "w"):
            pass

    return (
        vectors.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
