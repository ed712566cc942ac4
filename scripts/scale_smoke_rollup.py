#!/usr/bin/env python
"""Incremental-rollup scale smoke: initial load of N synthetic events
spanning 30 days, then a one-day increment — the increment must cost a
small fraction of the initial load (touched-day-only maintenance) and the
final table must equal a one-shot rollup of all events.

Usage: python scripts/scale_smoke_rollup.py [n_events] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from vectordb_similarity_search_spark.operators.rollup import (  # noqa: E402
    hourly_rollup,
    read_rollup,
    upsert_rollup,
)
from vectordb_similarity_search_spark.session import get_spark  # noqa: E402

N_DAYS = 30
TYPES = ["click", "view", "buy", "error", "scroll"]


def gen_events(spark, n: int, day_offset: int = 0, n_days: int = N_DAYS):
    """n deterministic events uniform over ``n_days`` days starting at
    2024-01-01 + day_offset."""
    sec_span = n_days * 86400
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(
                secs=(F.pmod(F.xxhash64("id"), F.lit(sec_span)) + day_offset * 86400)
            )
        ).alias("ts"),
        F.element_at(
            F.array(*[F.lit(t) for t in TYPES]),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(len(TYPES))) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)) / 10.0).alias("value"),
    )


def canon(df):
    return sorted(
        (r["day"], r["hour"], r["event_type"], r["n_events"], round(r["sum_value"], 4))
        for r in df.select("day", "hour", "event_type", "n_events", "sum_value").collect()
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="rollup_smoke_")
    path = os.path.join(work, "rollup")
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    initial = gen_events(spark, n).persist()
    initial.count()
    inc_n = n // N_DAYS
    # the increment lands entirely on the LAST loaded day (day 29)
    increment = gen_events(spark, inc_n, day_offset=N_DAYS - 1, n_days=1).persist()
    increment.count()

    t0 = time.time()
    upsert_rollup(spark, path, initial)
    t_initial = time.time() - t0

    t0 = time.time()
    touched = upsert_rollup(spark, path, increment)
    t_inc = time.time() - t0

    ok_days = touched == ["2024-01-30"]  # day index 29 = Jan 30
    final = canon(read_rollup(spark, path))
    want = canon(hourly_rollup(initial.unionByName(increment)))
    ok_equal = final == want
    print(
        f"n={n} initial={t_initial:.1f}s increment({inc_n} rows, 1 of {N_DAYS} "
        f"days)={t_inc:.1f}s ratio={t_inc / t_initial:.2f} "
        f"touched={touched} equal={ok_equal}"
    )
    assert ok_days, touched
    assert ok_equal
    # locally both sides carry seconds of fixed job overhead; the honest
    # scale claim is only that the increment doesn't rescan the table —
    # requiring it strictly cheaper than the 30-day load still catches an
    # accidental full-rescan regression at any n
    assert t_inc < t_initial, "increment must not rescan the full table"
    shutil.rmtree(work, ignore_errors=True)
    print("OK")


if __name__ == "__main__":
    main()
