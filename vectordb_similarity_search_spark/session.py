"""SparkSession factory with scale-aware defaults.

Defaults target correctness on ``local[N]`` while remaining the right
settings for a large cluster: AQE on (runtime shuffle coalescing + skew-join
splitting), Arrow on (vectorized pandas_udf transfer), UTC session timezone
(so timestamp semantics match the DuckDB oracle and are cluster-stable).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vectordb-similarity-search-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    On a real cluster, ``master``/executor sizing come from spark-submit; we
    only set logical-plan-level configs here so the same code runs on
    ``local[32]`` and on 1000 executors.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # At 100 TB you want O(2-3x total cores) partitions; AQE coalesces
        # down when partitions are small, so err on the high side there.
        # Locally, match the core count to avoid tiny-task overhead.
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # The events fixture stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as long (ns since epoch) and normalize in the
        # loader (sources/tables.py) to TimestampType at micro precision.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # 128 MiB input splits: good parallelism at TB scale without
        # drowning the scheduler in tasks.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
