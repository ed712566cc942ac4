"""Misra-Gries + exact-recount heavy hitters (operators/heavyhitters.py).

The operator's contract is *certified exactness*: either the returned
top-k is bit-identical to the full groupBy answer, or the plan raises.
These tests pin both arms plus the MG space/guarantee invariants the
100 TB story rests on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

try:  # Spark 4 moves user-facing errors
    from pyspark.errors import SparkRuntimeException
except ImportError:  # pragma: no cover
    SparkRuntimeException = Exception

from vectordb_similarity_search_spark.operators.heavyhitters import (
    heavy_hitters,
    mg_partition_candidates,
)


def _skewed(spark, n_parts=6):
    # zipf-ish: key k appears ~ 3000/k times for k in 1..40 → clear heavy
    # hitters with a long-ish tail, spread over several partitions.
    rows = []
    for k in range(1, 41):
        rows.extend([f"key_{k:03d}"] * (3000 // k))
    df = spark.createDataFrame(
        [(v,) for v in rows], "v string"
    ).repartition(n_parts)
    return df


def _exact_topk(df, k):
    return [
        (r["v"], r["cnt"])
        for r in df.groupBy("v")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("v").asc())
        .limit(k)
        .collect()
    ]


def test_matches_exact_groupby_topk(spark):
    df = _skewed(spark)
    got = [
        (r["v"], r["cnt"])
        for r in heavy_hitters(df, "v", 10, capacity=64)
        .orderBy("rank")
        .collect()
    ]
    assert got == _exact_topk(df, 10)


def test_tiny_capacity_still_exact_for_dominant_keys(spark):
    # capacity 16 << 40 distinct keys, so MG genuinely evicts — yet the
    # top-3 (counts 3000/1500/1000 of n≈12.8k > n/17≈756) are certified
    # and the recount makes them exact.
    df = _skewed(spark)
    got = [
        (r["v"], r["cnt"])
        for r in heavy_hitters(df, "v", 3, capacity=16)
        .orderBy("rank")
        .collect()
    ]
    assert got == _exact_topk(df, 3)


def test_uncertifiable_raises_not_underreports(spark):
    # Uniform distribution: no key exceeds n/(capacity+1) when capacity is
    # small, so exactness cannot be certified — the plan must raise.
    rows = [(f"u_{i % 50:02d}",) for i in range(5000)]
    df = spark.createDataFrame(rows, "v string").repartition(4)
    with pytest.raises((PythonException, SparkRuntimeException, Exception)) as ei:
        heavy_hitters(df, "v", 5, capacity=10).collect()
    assert "not certified" in str(ei.value)


def test_mg_candidate_output_is_bounded(spark):
    df = _skewed(spark, n_parts=5)
    cap = 16
    out = mg_partition_candidates(df, "v", cap).collect()
    markers = [r for r in out if r["key"] is None]
    cands = [r for r in out if r["key"] is not None]
    # ≤ capacity candidates + exactly one marker per non-empty partition
    assert len(markers) <= 5
    assert len(cands) <= cap * len(markers)
    # marker rows reconstruct the exact input size without a second scan
    assert sum(r["part_rows"] for r in markers) == df.count()


def test_nulls_counted_in_total_but_never_candidates(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",), (None,)], "v string"
    ).coalesce(1)
    out = mg_partition_candidates(df, "v", 10).collect()
    assert sum(r["part_rows"] or 0 for r in out) == 5  # NULL rows counted
    assert {r["key"] for r in out if r["key"] is not None} == {"a", "b"}
    # and the top-k itself ignores NULL as a key
    got = heavy_hitters(df, "v", 1, capacity=10).collect()
    assert [(r["v"], r["cnt"]) for r in got] == [("a", 2)]


def test_validation():
    with pytest.raises(ValueError):
        mg_partition_candidates(None, "v", 0)
    with pytest.raises(ValueError):
        heavy_hitters(None, "v", 0)


def test_shortfall_raises_instead_of_truncating(spark):
    # Round-4 review repro: 1 hot key + 50 singletons with capacity 4 —
    # MG eviction leaves fewer than k candidates. The old plan returned
    # 1 row silently; the contract is raise.
    rows = [("hot",)] * 100 + [(f"s_{i:02d}",) for i in range(50)]
    df = spark.createDataFrame(rows, "v string").coalesce(1)
    with pytest.raises((PythonException, SparkRuntimeException, Exception)) as ei:
        heavy_hitters(df, "v", 3, capacity=4).collect()
    assert "not certified" in str(ei.value)


def test_all_evicted_raises_instead_of_empty(spark):
    # Uniform singletons, capacity far below the domain: the batched
    # decrement can kill EVERY counter. The result frame would be empty,
    # so the raise must ride the broadcast-side marker rows.
    rows = [(f"s_{i:03d}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string").coalesce(1)
    with pytest.raises((PythonException, SparkRuntimeException, Exception)) as ei:
        heavy_hitters(df, "v", 3, capacity=4).collect()
    assert "not certified" in str(ei.value)


def test_small_domain_returns_whole_domain_without_raise(spark):
    # 2 distinct keys, k=5, no eviction (capacity >> domain): exact answer
    # is the whole domain — must NOT raise even though counts can sit far
    # below n/(capacity+1) (the old per-row threshold check would have).
    rows = [("a",)] * 7 + [("b",)] * 3 + [(None,)] * 990
    df = spark.createDataFrame(rows, "v string").repartition(3)
    got = [
        (r["v"], r["cnt"], r["rank"])
        for r in heavy_hitters(df, "v", 5, capacity=64).orderBy("rank").collect()
    ]
    assert got == [("a", 7, 1), ("b", 3, 2)]


def test_no_eviction_certifies_below_threshold_counts(spark):
    # 1M-dominated shape: tail counts of 1 are far below n/(capacity+1)
    # yet exact because nothing was ever evicted.
    rows = [("big",)] * 5000 + [(f"t_{i:02d}",) for i in range(20)]
    df = spark.createDataFrame(rows, "v string").repartition(2)
    got = [
        (r["v"], r["cnt"])
        for r in heavy_hitters(df, "v", 5, capacity=128).orderBy("rank").collect()
    ]
    assert got == _exact_topk(df, 5)


def test_single_mg_scan_in_plan(spark):
    # The MG Arrow stage must appear exactly once in the physical plan
    # (round-4 review: the separate 1-row total broadcast re-ran it).
    df = _skewed(spark)
    plan = (
        heavy_hitters(df, "v", 5, capacity=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1, plan
