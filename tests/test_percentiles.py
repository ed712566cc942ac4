"""operators/percentiles.exact_percentiles: the distributed exact
percentile must be BIT-IDENTICAL to Spark's percentile() aggregate
(same order statistics, same interpolation arithmetic) while carrying
no O(group) single-task buffer — the round-10 replacement for the
ObjectHashAggregate percentile in r_winsorized_mean and the e_qsk exact
twins (guide §5)."""

from __future__ import annotations

import random
import struct

import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.percentiles import (
    exact_percentiles,
    exact_percentiles_sorted,
)


def _bits(x):
    return None if x is None else struct.pack("d", x)


def _assert_same(want, got):
    assert len(want) == len(got)
    for w, g in zip(want, got):
        assert _bits(w) == _bits(g), (w, g)


def test_global_matches_percentile_bitwise(spark):
    random.seed(101)
    for n in (1, 2, 3, 7, 1000, 4097):
        pool = [round(random.uniform(-50, 50), 2) for _ in range(max(1, n // 3))]
        vals = [random.choice(pool) for _ in range(n)]
        qs = [0.01, 0.25, 0.5, 0.99, random.random()]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        want = df.agg(
            F.percentile("v", F.array(*[F.lit(q) for q in qs])).alias("ps")
        ).head()["ps"]
        got = exact_percentiles(df, "v", qs).head()["ps"]
        _assert_same(want, got)


def test_grouped_with_null_group_and_null_values(spark):
    random.seed(7)
    rows = []
    for g in ("a", "b", None):
        for _ in range(random.randint(3, 400)):
            rows.append(
                (g, random.choice([None, round(random.uniform(0, 10), 1)]))
            )
    rows.append(("only_nulls", None))  # group vanishes: no non-null values
    df = spark.createDataFrame(rows, "g string, v double")
    qs = [0.5, 0.9]
    want = {
        r["g"]: r["ps"]
        for r in df.filter("v is not null")
        .groupBy("g")
        .agg(F.percentile("v", F.array(*[F.lit(q) for q in qs])).alias("ps"))
        .collect()
    }
    got = {
        r["g"]: r["ps"]
        for r in exact_percentiles(df, "v", qs, ["g"]).collect()
    }
    assert set(got) == set(want)  # incl. the NULL group, excl. only_nulls
    for k in want:
        _assert_same(want[k], got[k])


def test_constant_column(spark):
    df = spark.createDataFrame([(5.0,)] * 64, "v double")
    want = df.agg(F.percentile("v", F.array(F.lit(0.3), F.lit(0.97)))).head()[0]
    got = exact_percentiles(df, "v", [0.3, 0.97]).head()["ps"]
    _assert_same(want, got)


def test_sorted_variant_matches_percentile_bitwise(spark):
    """exact_percentiles_sorted (the many-groups sort+window form used
    by the qsk twins) against F.percentile, incl. NULL group keys, null
    values, and weighted duplicate (group, value) rows (the 7x window
    explode shape: duplicates must not double-cover rank ranges)."""
    random.seed(202)
    rows = []
    for g in ("a", "b", None):
        pool = [round(random.uniform(-5, 5), 1) for _ in range(30)]
        for _ in range(random.randint(5, 500)):
            rows.append((g, random.choice([None] + pool)))
    df = spark.createDataFrame(rows, "g string, v double")
    qs = [0.0, 0.5, 0.9, 1.0, 0.123]
    want = {
        r["g"]: r["ps"]
        for r in df.filter("v is not null")
        .groupBy("g")
        .agg(F.percentile("v", F.array(*[F.lit(q) for q in qs])).alias("ps"))
        .collect()
    }
    got = {
        r["g"]: r["ps"]
        for r in exact_percentiles_sorted(df, "v", qs, ["g"]).collect()
    }
    assert set(got) == set(want)
    for k in want:
        _assert_same(want[k], got[k])

    # weighted duplicates: (g, v) cells repeated with split weights must
    # agree with the flat frame
    cells = (
        df.filter("v is not null")
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    split = cells.select(
        "g", "v", F.explode(F.array(F.lit(1), F.col("w") - 1)).alias("w")
    ).filter("w > 0")
    got_w = {
        r["g"]: r["ps"]
        for r in exact_percentiles_sorted(
            split, "v", qs, ["g"], weight_col="w"
        ).collect()
    }
    assert set(got_w) == set(want)
    for k in want:
        _assert_same(want[k], got_w[k])


def test_sorted_variant_plan_shape(spark):
    """No Percentile ObjectHashAggregate buffer; the rank resolution is
    a (spillable) sort window."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("g"), F.col("id").cast("double").alias("v")
    )
    plan = (
        exact_percentiles_sorted(df, "v", [0.5, 0.9], ["g"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "percentile(" not in plan.lower()
    assert "Window" in plan


def test_no_object_hash_percentile_buffer(spark):
    """The whole point: the plan must not contain the Percentile
    ObjectHashAggregate (the O(group) single-task buffer)."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("g"), F.col("id").cast("double").alias("v")
    )
    plan = exact_percentiles(df, "v", [0.5], ["g"])._jdf.queryExecution().executedPlan().toString()
    assert "percentile(" not in plan.lower()


@pytest.mark.parametrize(
    "name", ["r_winsorized_mean", "e_qsk_rolling_percentiles", "e_qsk_type_percentiles"]
)
def test_rewritten_queries_plan_has_no_percentile_buffer(spark, sf_dir, name):
    from vectordb_similarity_search_spark.plans import REGISTRY

    df = REGISTRY[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "percentile(" not in plan.lower()
