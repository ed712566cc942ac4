"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame) -> DataFrame:
    """Raise the partition count of a NARROW input to the session's default
    parallelism before a per-row-heavy pass (Arrow ``mapInPandas``, wide
    HOF expression chains).

    Why: Spark parallelizes a narrow pass by *input splits*. A small local
    parquet file scans as 1-2 splits, so an expensive per-document pass
    (MinHash signatures, 64-bit simhash folds, winnowing) runs on a single
    core while 31 sit idle. At production scale the input already carries
    >= cores partitions and this branch is a no-op — no shuffle is added
    where it would hurt. Round-robin repartition is safe here because
    per-row transforms are partitioning-independent.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
