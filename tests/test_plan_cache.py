"""Registry-level plan cache (plans/catalog._PLAN_CACHE, round 9).

The cache memoizes the LOGICAL PLAN handle per (applicationId, sf_dir,
query) — never results: executing the cached handle must run Spark jobs
every time (recompute-from-parquet is the bench/oracle contract; a
result cache would be gaming). These tests pin:

1. same (session, sf_dir, query) → the identical DataFrame object
   (the build-once property the bench timed runs rely on);
2. different sf_dir → a different plan (no cross-sf leakage);
3. executing the cached handle twice runs jobs BOTH times — the plan
   cache is not a result cache;
4. entries keyed to a dead application are evicted on insert (the
   evict_other_apps sweep — no unbounded growth across session
   restarts).
"""

from __future__ import annotations

import uuid

from vectordb_similarity_search_spark.plans import REGISTRY, catalog

ORACLE_SF = "/root/testdata/sf0.01"


def test_same_handle_per_session_and_sf(spark, sf_dir):
    a = REGISTRY["r_pricing_summary"].fn(spark, sf_dir)
    b = REGISTRY["r_pricing_summary"].fn(spark, sf_dir)
    assert a is b


def test_distinct_plans_per_sf_dir(spark, sf_dir):
    a = REGISTRY["r_pricing_summary"].fn(spark, sf_dir)
    b = REGISTRY["r_pricing_summary"].fn(spark, ORACLE_SF)
    assert a is not b


def test_cached_handle_recomputes_every_action(spark, sf_dir):
    sc = spark.sparkContext
    df = REGISTRY["r_pricing_summary"].fn(spark, sf_dir)
    for attempt in range(2):
        group = f"plan-cache-probe-{uuid.uuid4().hex[:8]}"
        sc.setJobGroup(group, f"exec {attempt}")
        try:
            df.write.format("noop").mode("overwrite").save()
        finally:
            sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        assert len(jobs) >= 1, (
            f"execution {attempt} of the cached plan ran no jobs — "
            "the plan cache must never cache results"
        )


def test_cached_reader_sees_post_merge_data(spark, tmp_path):
    """Round-10 (verdict #3): a snapshot-swapping write must evict the
    memoized plan handles — a cached lazy plan pins the pre-swap file
    listing and would read deleted files on its next action. Pinned
    end-to-end: cache a reader plan on a scratch table, MERGE into the
    table (swap_snapshot under the hood), and require (a) the plan cache
    was invalidated and (b) a re-obtained reader sees the merged data."""
    from pyspark.sql import functions as F

    from vectordb_similarity_search_spark.operators.merge import merge_parquet

    tbl = str(tmp_path / "t")
    spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    ).write.parquet(tbl)

    key = (spark.sparkContext.applicationId, tbl, "_scratch_reader")
    catalog._PLAN_CACHE[key] = spark.read.parquet(tbl)
    assert catalog._PLAN_CACHE[key].agg(F.sum("v")).head()[0] == 100

    upd = spark.range(0, 10).select(F.col("id").alias("k"), F.lit(5).alias("v"))
    merge_parquet(spark, tbl, upd, ["k"])

    assert key not in catalog._PLAN_CACHE, (
        "swap_snapshot must clear the registry plan cache"
    )
    fresh = spark.read.parquet(tbl)
    assert fresh.agg(F.sum("v")).head()[0] == 90 + 10 * 5


def test_cached_reader_evicted_by_partitioned_merge(spark, tmp_path):
    """The PARTITIONED rewrite paths rename individual partition dirs and
    never go through swap_snapshot — they must evict through the same
    helper (round-10 review finding), including when the batch only ADDS
    a brand-new partition."""
    from pyspark.sql import functions as F

    from vectordb_similarity_search_spark.operators.merge import (
        merge_parquet_partitioned,
    )

    tbl = str(tmp_path / "pt")
    spark.range(0, 40).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).alias("p"),
        F.lit(1).alias("v"),
    ).write.partitionBy("p").parquet(tbl)

    key = (spark.sparkContext.applicationId, tbl, "_scratch_preader")
    catalog._PLAN_CACHE[key] = spark.read.parquet(tbl)
    assert catalog._PLAN_CACHE[key].count() == 40

    # updates land ONLY in a brand-new partition p=7 (the add-only branch)
    upd = spark.range(100, 105).select(
        F.col("id").alias("k"), F.lit(7).alias("p"), F.lit(9).alias("v")
    )
    merge_parquet_partitioned(spark, tbl, upd, ["k", "p"], ["p"])

    assert key not in catalog._PLAN_CACHE, (
        "partitioned merge must clear the registry plan cache"
    )
    assert spark.read.parquet(tbl).count() == 45


def test_dead_app_entries_evicted(spark, sf_dir):
    REGISTRY["r_pricing_summary"].fn(spark, sf_dir)
    dead = ("app-dead-123", sf_dir, "r_pricing_summary")
    catalog._PLAN_CACHE[dead] = object()
    REGISTRY["r_scalar_math"].fn(spark, sf_dir)  # any insert sweeps
    assert dead not in catalog._PLAN_CACHE
    live_apps = {k[0] for k in catalog._PLAN_CACHE}
    assert live_apps == {spark.sparkContext.applicationId}
