#!/usr/bin/env python
"""Pruned-vs-full MERGE at a scale where data cost beats Spark constants:
a 5M-row, 100-partition table with CDC confined to 2 partitions.

The claim under test (operators/merge.py): the full rewrite is O(table),
the pruned path is O(touched partitions) end-to-end — scan, join, write
and swap. At 5M rows the asymptote should already be visible through the
constants, and the untouched partitions' files must be byte-identical
(same mtimes) afterwards.

    python scripts/scale_smoke_merge.py   # ~2 min
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_ROWS = 5_000_000
ROWS_PER_PART = 50_000  # partition size held constant as the table grows,
                        # so "touched" stays the same absolute work and the
                        # pruned wall should be ~flat while full-rewrite
                        # wall grows with the table
TOUCH = 2  # CDC touches this many partitions


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_similarity_search_spark.operators.merge import (
        merge_parquet,
        merge_parquet_partitioned,
    )
    from vectordb_similarity_search_spark.session import get_spark

    spark = get_spark(
        app_name="scale-smoke-merge", master="local[32]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_parts = max(4, N_ROWS // ROWS_PER_PART)

    base = (
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("k"),
            F.pmod(F.xxhash64("id"), F.lit(n_parts)).cast("int").alias("bucket"),
            (F.rand(7) * 1000).alias("val"),
            F.concat(F.lit("payload_"), F.col("id")).alias("s"),
        )
    )
    work = tempfile.mkdtemp(prefix="smoke_merge_")
    ptbl = os.path.join(work, "part_tbl")
    ftbl = os.path.join(work, "flat_tbl")
    base.write.partitionBy("bucket").parquet(ptbl)
    base.write.parquet(ftbl)

    # CDC: 10% of the rows in 2 buckets get a val bump — a batch small
    # relative to the table, confined to few partitions (the shape daily
    # CDC actually has)
    from vectordb_similarity_search_spark.operators.sampling import (
        hash_sample,
    )

    # The CDC batch is WRITTEN OUT and re-read before any merge mutates
    # ptbl: a cached frame whose lineage reads ptbl would recompute from
    # a pinned listing of deleted files if its blocks were ever evicted
    # after the pruned merge swaps bucket dirs.
    cdc_path = os.path.join(work, "cdc_batch")
    (
        hash_sample(
            spark.read.parquet(ptbl).filter(F.col("bucket") < TOUCH),
            0.1,
            ["k"],
        )
        .withColumn("val", F.col("val") + 1.0)
        .write.parquet(cdc_path)
    )
    cdc = spark.read.parquet(cdc_path)
    n_cdc = cdc.count()

    before = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{ptbl}/**/*.parquet", recursive=True)
        if not any(f"bucket={b}/" in f for b in range(TOUCH))
    }
    t0 = time.perf_counter()
    n_rewritten = merge_parquet_partitioned(
        spark, ptbl, cdc, ["k", "bucket"], ["bucket"]
    )
    t_pruned = time.perf_counter() - t0

    t0 = time.perf_counter()
    merge_parquet(spark, ftbl, cdc, ["k", "bucket"], retain_history=3)
    t_full = time.perf_counter() - t0

    # time travel at scale: the pre-merge snapshot stayed queryable, and
    # diffing it against the live table reports EXACTLY the CDC batch
    from vectordb_similarity_search_spark.operators.diff import diff_summary
    from vectordb_similarity_search_spark.operators.timetravel import (
        list_versions,
        read_version,
    )

    t0 = time.perf_counter()
    versions_ok = list_versions(ftbl) == [1]
    rep = {
        r.metric: r.n
        for r in diff_summary(
            read_version(spark, ftbl, 1),
            spark.read.parquet(ftbl),
            ["k", "bucket"],
        ).collect()
    }
    t_diff = time.perf_counter() - t0
    tt_ok = (
        versions_ok
        and rep["rows_changed"] == n_cdc
        and rep["rows_added"] == 0
        and rep["rows_removed"] == 0
        and rep["col_changed_val"] == n_cdc
        and rep["col_changed_s"] == 0
    )

    after = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{ptbl}/**/*.parquet", recursive=True)
        if not any(f"bucket={b}/" in f for b in range(TOUCH))
    }
    untouched_ok = before == after
    merged_rows = spark.read.parquet(ptbl).count()
    flat_rows = spark.read.parquet(ftbl).count()
    # every CDC row's new value landed, exactly once
    applied = (
        spark.read.parquet(ptbl)
        .join(cdc.select("k", F.col("val").alias("cv")), "k")
        .filter(F.abs(F.col("val") - F.col("cv")) < 1e-9)
        .count()
    )

    ok = (
        n_rewritten == TOUCH
        and untouched_ok
        and merged_rows == flat_rows == N_ROWS
        and applied == n_cdc
        and t_pruned < t_full
        and tt_ok
    )
    print(
        {
            "rows": N_ROWS,
            "partitions": n_parts,
            "cdc_rows": n_cdc,
            "partitions_rewritten": n_rewritten,
            "wall_pruned_s": round(t_pruned, 2),
            "wall_full_s": round(t_full, 2),
            "speedup": round(t_full / t_pruned, 1),
            "cdc_applied_exactly": applied == n_cdc,
            "untouched_files_identical": untouched_ok,
            "asof_diff_reports_cdc_exactly": tt_ok,
            "wall_asof_diff_s": round(t_diff, 2),
            "ok": ok,
        }
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
