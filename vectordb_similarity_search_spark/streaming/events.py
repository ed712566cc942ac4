"""Structured Streaming jobs over the events stream (SURVEY.md §2.9 — the
reference has NO streaming; this is north-star surface).

Design: each job is the SAME transformation the batch catalog checks
against the DuckDB oracle (plans/event_queries.py) applied to a streaming
DataFrame + a watermark. Spark's unified batch/stream planner makes the
batch oracle a genuine correctness proxy; what the stream tests add
(tests/test_streaming.py) is watermark/late-data and incremental-state
behavior.

Scale notes: state stores are keyed by (window, type) / (user, session) /
event_id — all bounded by the watermark horizon; shuffle partitioning is
the state partitioning. At 100 TB/day you size
``spark.sql.shuffle.partitions`` to the state volume, not the input rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts_stream(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed counts/sums per event type with late-data handling: events
    later than the watermark are dropped, windows finalize (append-able)
    once the watermark passes their end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (native session_window state merge —
    the streaming form of plans/event_queries.e_session_windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    *,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key within
    the watermark horizon (``dropDuplicatesWithinWatermark`` — state expires
    with the watermark, so memory is bounded; the streaming form of the
    exact-dedup operator)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def running_user_totals_stream(
    events: DataFrame,
    *,
    watermark: str = "2 hours",
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (the
    north-star 'custom stateful operator' slot): per-user running event
    count + value total, one update row per user per micro-batch.

    State = (count, total) per user — O(users), not O(events). Pass
    ``timeout_minutes`` to expire idle users' state on a processing-time
    clock; note that processing-time timeouts make the query schedule
    micro-batches continuously to advance the clock (so
    ``processAllAvailable`` will not settle — use a real trigger in
    production, leave None for drain-style tests).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
    state_schema = "n BIGINT, total DOUBLE"
    with_timeout = timeout_minutes is not None

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if with_timeout:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if with_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
