"""profile_table (operators/profile.py): one-pass per-column stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.profile import profile_table
from vectordb_similarity_search_spark.sources.tables import load_table


def test_exact_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "k int, v string"
    )
    rows = {r.column: r for r in profile_table(df, approx=False).collect()}
    assert rows["k"].n_rows == 4 and rows["v"].n_rows == 4
    assert rows["k"].n_nulls == 1 and rows["v"].n_nulls == 1
    assert rows["k"].n_distinct == 2 and rows["v"].n_distinct == 2


def test_approx_profile_close_to_exact_one_scan(spark, sf_dir):
    from .conftest import plan_of

    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    exact = {r.column: r.n_distinct for r in profile_table(orders, cols, approx=False).collect()}
    approx = profile_table(orders, cols, approx=True, rsd=0.02)
    for r in approx.collect():
        assert r.n_distinct == pytest.approx(exact[r.column], rel=0.1)
    # HLL mode: no EXPAND (the exact mode's per-column input replication)
    assert "Expand" not in plan_of(approx)


def test_unknown_column_rejected(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(orders, ["nope"])


def test_degenerate_column_lists_rejected(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="no columns"):
        profile_table(orders, [])
    with pytest.raises(ValueError, match="duplicate columns"):
        profile_table(orders, ["o_custkey", "o_custkey"])


def test_psi_zero_for_identical_populations(spark, sf_dir):
    from vectordb_similarity_search_spark.operators.profile import (
        population_stability,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    feat = F.element_at("embedding", 1).cast("double")
    rows = population_stability(emb, emb, feat).collect()
    assert len(rows) == 8
    assert all(r.psi_term == 0.0 for r in rows)
    assert sum(r.n_ref for r in rows) == emb.count()


def test_psi_detects_a_shifted_population(spark, sf_dir):
    from vectordb_similarity_search_spark.operators.profile import (
        population_stability,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    feat = F.element_at("embedding", 1).cast("double")
    shifted = emb.select(
        (F.element_at("embedding", 1).cast("double") + 0.5).alias("x")
    )
    rows = population_stability(emb.select(feat.alias("x")), shifted, F.col("x")).collect()
    assert sum(r.psi_term for r in rows) > 0.25  # "shifted" threshold


def test_psi_validates_bins(spark, sf_dir):
    from vectordb_similarity_search_spark.operators.profile import (
        population_stability,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="n_bins"):
        population_stability(emb, emb, F.lit(0.0), n_bins=1)
