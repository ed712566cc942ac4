"""Mergeable-sketch ledgers: pre-aggregated HyperLogLog distinct-count
sketches that answer ANY later rollup without rescanning raw data.

The 100 TB problem this solves: "distinct users per 7-day window, per
month, per event type, overall" each naively re-shuffle the raw event log
per question. Apache DataSketches HLL (Spark's built-in
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) makes
distinct-count state a ~2^lg_k-byte MERGEABLE value: sketch once per
(day, event_type) leaf — ONE linear pass over the log — then every
rollup (rolling windows, type totals, grand total) is an aggregation
over the tiny ledger, never the log. A day's late data is one
``hll_union`` against that day's stored sketch: incremental maintenance
without history rescans.

Determinism contract (verified in tests/test_sketches.py): HLL register
state is a pure max over per-item hashes, so ESTIMATES are independent
of partitioning, merge grouping, and row order — a leaf-union rollup
equals the direct sketch over the base rows bit-for-bit, and the
expected-parquet oracles of the catalog queries are stable across
sessions. (Serialized sketch BYTES are not canonical across merge
orders — sparse/dense internal modes differ — so parity is pinned on
estimates, never on blob bytes. KLL quantile sketches were evaluated
and EXCLUDED: Spark's implementation is randomized per run, which
breaks the repo's oracle bar.)

Reference parity: the reference engine has no sketch surface
(similarity_search.py is exact-only); this module is part of the
mandated large-scale-pipeline superset.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# 2^12 registers ≈ 0.8% relative standard error — the classic
# cost/accuracy point; callers can widen for tighter bounds.
DEFAULT_LG_K = 12


def daily_hll_sketches(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """ONE linear pass over the event log → the leaf sketch ledger:
    ``(day, event_type, n_events, sk)`` with ``sk`` an HLL sketch of the
    distinct ``key_col`` values. This is the only operator here that
    touches the raw log; everything downstream aggregates the ledger
    (days × types rows, ~4 KB each at lg_k=12)."""
    if not 4 <= lg_k <= 21:
        raise ValueError(f"lg_k must be in [4, 21], got {lg_k}")
    return (
        events.select(
            F.to_date(ts_col).alias("day"),
            F.col(type_col).alias("event_type"),
            F.col(key_col).alias("_k"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.hll_sketch_agg("_k", F.lit(lg_k)).alias("sk"),
        )
    )


def hll_estimate(sk: Column | str) -> Column:
    return F.hll_sketch_estimate(sk).cast("long")


def _rolling(
    ledger: DataFrame, window_days: int, extra_keys: tuple[str, ...]
) -> DataFrame:
    """Shared trailing-window engine: each ledger row EXPLODES into the
    ``window_days`` output days it contributes to (a Generate, no join
    predicate), a broadcast equi semi-join keeps only days that actually
    occur in the ledger, then one ``hll_union_agg`` per (day, *extra
    keys). ONE copy serves the all-types and per-type forms so the
    window semantics cannot diverge."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    days = ledger.select("day").distinct().select(F.col("day").alias("out_day"))
    contrib = ledger.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(window_days - 1))
        ).alias("_off"),
        "day",
        *extra_keys,
        "n_events",
        "sk",
    ).select(
        F.date_add(F.col("day"), F.col("_off")).alias("out_day"),
        *extra_keys,
        "n_events",
        "sk",
    )
    rolled = (
        contrib.join(F.broadcast(days), "out_day", "left_semi")
        .groupBy("out_day", *extra_keys)
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.hll_union_agg("sk").alias("sk"),
        )
    )
    return rolled.select(
        F.col("out_day").alias("day"),
        *extra_keys,
        "n_events",
        hll_estimate("sk").alias("est_distinct"),
    )


def rolling_distinct(ledger: DataFrame, window_days: int = 7) -> DataFrame:
    """Trailing ``window_days``-day distinct-key estimate per day from
    the LEAF LEDGER alone. Cost is O(|ledger| · window_days) on rows
    that are days×types in number — independent of the raw log size,
    which is the whole point. (A day-range self-join spells the same
    thing but plans a BroadcastNestedLoopJoin — the repo's
    plan-invariant sweep rejects non-equi joins on principle; the
    explode form in :func:`_rolling` is pure Generate + hash join.)
    Distinct-count is NOT sum-decomposable across days (a user active
    twice in the window counts once); the sketch union gets the
    de-duplicated semantics that a sum of daily counts cannot."""
    return _rolling(ledger, window_days, ())


def rollup_distinct(ledger: DataFrame) -> DataFrame:
    """Re-aggregability demo and ops rollup: per-event_type whole-range
    distinct estimates AND the all-types grand total, every number from
    the SAME leaf sketches via union — no raw-log pass. Output:
    ``(scope, n_events, est_distinct)`` with scope 'type:<event_type>'
    rows plus one 'total' row."""
    per_type = (
        ledger.groupBy("event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.hll_union_agg("sk").alias("sk"),
        )
        .select(
            F.concat(F.lit("type:"), F.col("event_type")).alias("scope"),
            "n_events",
            hll_estimate("sk").alias("est_distinct"),
        )
    )
    total = ledger.agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.hll_union_agg("sk").alias("sk"),
    ).select(
        F.lit("total").alias("scope"),
        "n_events",
        hll_estimate("sk").alias("est_distinct"),
    )
    return per_type.unionByName(total)


# ---------------------------------------------------------------------------
# Persisted ledger with incremental maintenance
# ---------------------------------------------------------------------------


def sketch_ledger_write(ledger: DataFrame, path: str) -> int:
    """Materialize the leaf ledger (binary sketch column round-trips
    through parquet). Partitioned by day so maintenance and windowed
    reads prune to the touched days."""
    ledger.write.partitionBy("day").mode("overwrite").parquet(path)
    return ledger.sparkSession.read.parquet(path).count()


def sketch_ledger_merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    *,
    key_col: str = "user_id",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Incremental maintenance: fold a NEW batch of raw events into the
    stored ledger WITHOUT rescanning history — sketch the batch (one
    pass over batch rows only), then per (day, event_type) union against
    the stored sketch where one exists. Returns the merged ledger frame
    (caller snapshots it back with :func:`sketch_ledger_write`-style
    swap; kept pure here so tests can pin merged == full-rebuild
    estimates bit-for-bit). Late-arriving data for an old day is just
    another union. Replay semantics: the DISTINCT estimates are
    replay-safe (HLL union is a register max — identical keys cannot
    drift it), but the ``n_events`` sum assumes exactly-once batches;
    an at-least-once upstream must dedupe before merging."""
    stored = spark.read.parquet(path)
    delta = daily_hll_sketches(batch, key_col=key_col, lg_k=lg_k)
    merged = (
        stored.select("day", "event_type", "n_events", "sk")
        .unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.hll_union_agg("sk").alias("sk"),
        )
    )
    return merged


def sketch_ledger_upsert_batch(
    batch: DataFrame,
    path: str,
    *,
    key_col: str = "user_id",
    lg_k: int = DEFAULT_LG_K,
) -> int:
    """O(touched-days) ledger maintenance: sketch the batch, read back
    ONLY the stored day-partitions the batch touches (partition-pruned
    scan), union-merge, and dynamically overwrite just those day dirs —
    untouched history is never read or rewritten (the repo's
    partitioned-merge discipline). Bootstrap: a missing store is created
    from the batch alone. Returns the number of day partitions written.

    The merged rows are materialized driver-side before the write —
    touched_days x event_types rows of ~4 KB sketches, a bounded frame —
    because Spark cannot read and overwrite the same parquet path in one
    lazy plan (self-overwrite would tear the source mid-write)."""
    spark = batch.sparkSession
    delta = daily_hll_sketches(batch, key_col=key_col, lg_k=lg_k)
    if not os.path.isdir(path):
        delta.write.partitionBy("day").mode("overwrite").parquet(path)
        return delta.select("day").distinct().count()
    touched = [r["day"] for r in delta.select("day").distinct().collect()]
    if not touched:
        return 0
    stored = spark.read.parquet(path).filter(F.col("day").isin(touched))
    merged_rows = (
        stored.select("day", "event_type", "n_events", "sk")
        .unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.hll_union_agg("sk").alias("sk"),
        )
        .collect()
    )
    merged = spark.createDataFrame(merged_rows, schema=delta.schema)
    (
        merged.write.partitionBy("day")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )
    return len(touched)


def rolling_distinct_by_type(
    ledger: DataFrame, window_days: int = 7
) -> DataFrame:
    """Per-event_type trailing window: :func:`_rolling` grouped by
    (day, event_type) — each type's trailing distinct users, deduped
    within type across days. Output: ``(day, event_type, n_events,
    est_distinct)``."""
    return _rolling(ledger, window_days, ("event_type",))
