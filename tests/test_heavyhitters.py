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
