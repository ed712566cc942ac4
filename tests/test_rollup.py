"""Incremental rollup maintenance (operators/rollup.py): applying event
batches incrementally must equal a one-shot rollup of all events, and a
batch must only rewrite the day partitions it touches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.rollup import (
    hourly_rollup,
    read_rollup,
    upsert_rollup,
)
from vectordb_similarity_search_spark.sources.tables import load_table

from .conftest import SMOKE_SF


def _canon(df):
    return sorted(
        (r["day"], r["hour"], r["event_type"], r["n_events"],
         round(r["sum_value"], 6), round(r["min_value"], 6),
         round(r["max_value"], 6))
        for r in df.select(
            "day", "hour", "event_type", "n_events",
            "sum_value", "min_value", "max_value",
        ).collect()
    )


def test_incremental_equals_one_shot(spark, tmp_path):
    events = load_table(spark, SMOKE_SF, "events")
    cut = events.agg(F.percentile(F.col("ts").cast("long"), F.lit(0.5))).head()[0]
    path = str(tmp_path / "rollup")

    # two batches split MID-STREAM (the cut lands inside an hour, so the
    # boundary hour's partials must merge across batches)
    upsert_rollup(spark, path, events.filter(F.col("ts").cast("long") <= cut))
    upsert_rollup(spark, path, events.filter(F.col("ts").cast("long") > cut))

    assert _canon(read_rollup(spark, path)) == _canon(hourly_rollup(events))


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    events = load_table(spark, SMOKE_SF, "events")
    days = [
        r[0]
        for r in events.select(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct()
        .orderBy("d")
        .collect()
    ]
    assert len(days) >= 2, "fixture must span multiple days"
    first_day, last_day = days[0], days[-1]
    path = str(tmp_path / "rollup")

    upsert_rollup(spark, path, events)
    before = set(os.listdir(os.path.join(path, f"day={first_day}")))

    # second batch touches ONLY the last day
    touched = upsert_rollup(
        spark,
        path,
        events.filter(F.date_format("ts", "yyyy-MM-dd") == last_day),
    )
    assert touched == [last_day]
    after = set(os.listdir(os.path.join(path, f"day={first_day}")))
    assert before == after  # untouched day partition: identical files

    # and the touched day now holds DOUBLED counts (events applied twice)
    doubled = (
        spark.read.parquet(path)
        .filter(F.col("day") == last_day)
        .agg(F.sum("n_events"))
        .head()[0]
    )
    one_shot = (
        hourly_rollup(events)
        .filter(F.col("day") == last_day)
        .agg(F.sum("n_events"))
        .head()[0]
    )
    assert doubled == 2 * one_shot


def test_read_rollup_derives_avg(spark, tmp_path):
    events = load_table(spark, SMOKE_SF, "events")
    path = str(tmp_path / "rollup")
    upsert_rollup(spark, path, events)
    row = (
        read_rollup(spark, path)
        .withColumn("check", F.abs(F.col("avg_value") - F.col("sum_value") / F.col("n_events")))
        .agg(F.max("check"))
        .head()
    )
    assert row[0] == 0.0


def test_crashed_swap_recovers(spark, tmp_path):
    """A crash between the two renames of a day swap leaves the partition
    parked under day=X__old_*; the next upsert must restore it first."""
    import shutil

    events = load_table(spark, SMOKE_SF, "events")
    path = str(tmp_path / "rollup")
    upsert_rollup(spark, path, events)
    day_dirs = sorted(
        d for d in os.listdir(path) if d.startswith("day=") and "__old_" not in d
    )
    victim = os.path.join(path, day_dirs[0])

    # simulate the crash window: live dir gone, old snapshot parked
    os.rename(victim, victim + "__old_deadbeef")

    # next maintenance run restores it (no events for that day in batch 2)
    last_day = day_dirs[-1].split("=", 1)[1]
    upsert_rollup(
        spark, path, events.filter(F.date_format("ts", "yyyy-MM-dd") == last_day)
    )
    assert os.path.exists(victim)
    assert not os.path.exists(victim + "__old_deadbeef")
    shutil.rmtree(path)  # keep tmp_path reusable across pytest reruns
