"""Parquet table loaders for the driver fixtures (TESTDATA.md).

The reference keeps everything in in-memory dicts/numpy
(similarity_search.py:268-271) with no file I/O at all (SURVEY.md §2.1);
our engine's storage layer is columnar Parquet read through the DataFrame
reader, which gives predicate pushdown + column pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..util import evict_other_apps

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# One logical-plan per (session, sf_dir, table): spark.read.parquet runs a
# 1-task footer job per CALL (schema read), so uncached repeat builds pay a
# job each. DataFrames are immutable lazy plans — sharing one across queries
# is free and keeps query BUILD zero-job after first touch (pinned by
# tests/test_lazy_build.py). Keyed by applicationId so a new session never
# sees a dead session's plans.
_SCAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Column pruning/filter pushdown happen at the
    parquet scan because we return the raw declarative scan, not a cache
    of data (only the logical plan is reused).

    events.ts is TIMESTAMP(NANOS) in parquet. Depending on the Spark build
    it surfaces either as LONG (when ``nanosAsLong`` applies) or as
    TIMESTAMP_NTZ truncated to micros (newer readers ignore the legacy conf
    and map nanos to NTZ natively). Both forms are normalized HERE at
    runtime — not only in our session factory — because the grading driver
    builds its own plain SparkSession. Target type is TimestampType at
    micro precision with UTC session semantics: long path uses integer DIV
    (no double round-trip, 2^63 ns is beyond double's 53-bit mantissa); NTZ
    path reinterprets the wall-clock as UTC (session tz pinned below), so
    both builds produce identical micros."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    evict_other_apps(_SCAN_CACHE, key[0])
    cached = _SCAN_CACHE.get(key)
    if cached is not None:
        return cached
    # The engine's timestamp semantics are UTC (matches the DuckDB oracle
    # and is cluster-stable); pin it here too since the caller's session
    # may not come from our factory.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Rank-limit windows (top-k per group) convert to WindowGroupLimit —
    # the map-side partial top-k heap — only when the limit is <= this
    # threshold; the stratified-sample cap (1024) sits past the 1000
    # default. Runtime conf, pinned HERE like the timezone because the
    # grading driver's plain session never saw our factory (round-10
    # review finding). Scale-neutral: bounds per-task heap ENTRIES.
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "4096")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # NTZ wall-clock == UTC instant here (fixture is UTC-generated
            # and the session tz is pinned to UTC above), so the cast is a
            # pure type change, not a value shift.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _SCAN_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all fixture tables as SQL temp views (for spark.sql plans)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
