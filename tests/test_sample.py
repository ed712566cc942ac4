"""Sampling primitives: seed determinism and rate tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_similarity_search_spark.sources.tables import load_table


def test_uniform_sample_deterministic_and_sized(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    a = li.sample(fraction=0.1, seed=7).count()
    b = li.sample(fraction=0.1, seed=7).count()
    assert a == b  # same seed + same partitioning -> identical sample
    n = li.count()
    assert 0.05 * n < a < 0.15 * n


def test_stratified_sample_rates(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    labels = [r[0] for r in emb.select("label").distinct().collect()]
    frac = {l: (0.8 if l == labels[0] else 0.2) for l in labels}
    got = (
        emb.sampleBy("label", frac, seed=11)
        .groupBy("label").count().collect()
    )
    base = {r["label"]: r["count"] for r in emb.groupBy("label").count().collect()}
    for r in got:
        rate = r["count"] / base[r["label"]]
        assert abs(rate - frac[r["label"]]) < 0.25  # tolerance at small n
