"""cluster_aware_split: leakage-free split semantics.

The contract under test: near-dup cluster members NEVER straddle a
split; assignment is a pure content function (stable under appends of
unrelated rows); splits are disjoint and exhaustive.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vectordb_similarity_search_spark.operators.sampling import (
    cluster_aware_split,
    split_bounds_hex,
)

W = {"train": 0.8, "val": 0.1, "test": 0.1}


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _items(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_cluster_members_share_split_and_key(spark):
    # chain 1-2-3 plus pair (10,11): both clusters must be atomic
    items = _items(spark, range(20))
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
    rows = {r.doc_id: r for r in cluster_aware_split(items, pairs, W).collect()}
    assert len(rows) == 20
    assert {rows[i].cluster_key for i in (1, 2, 3)} == {1}
    assert len({rows[i].split for i in (1, 2, 3)}) == 1
    assert {rows[i].cluster_key for i in (10, 11)} == {10}
    assert rows[10].split == rows[11].split
    # singletons are their own cluster
    assert rows[7].cluster_key == 7


def test_disjoint_exhaustive_and_roughly_weighted(spark):
    items = _items(spark, range(2000))
    pairs = _pairs(spark, [(0, 1)])
    out = cluster_aware_split(items, pairs, W).toPandas()
    assert len(out) == 2000 and out.doc_id.nunique() == 2000
    shares = out.split.value_counts(normalize=True)
    assert 0.7 < shares["train"] < 0.9
    assert 0.05 < shares["val"] < 0.16
    assert 0.05 < shares["test"] < 0.16


def test_assignment_stable_under_unrelated_appends(spark):
    pairs = _pairs(spark, [(3, 4)])
    small = cluster_aware_split(_items(spark, range(50)), pairs, W).toPandas()
    big = cluster_aware_split(_items(spark, range(500)), pairs, W).toPandas()
    merged = small.merge(big, on="doc_id", suffixes=("_s", "_b"))
    assert (merged.split_s == merged.split_b).all()
    assert (merged.cluster_key_s == merged.cluster_key_b).all()


def test_weights_normalize(spark):
    items = _items(spark, range(100))
    pairs = _pairs(spark, [(0, 1)])
    a = cluster_aware_split(items, pairs, {"x": 1.0, "y": 1.0}).toPandas()
    b = cluster_aware_split(items, pairs, {"x": 500, "y": 500}).toPandas()
    m = a.merge(b, on="doc_id")
    assert (m.split_x == m.split_y).all()


def test_split_bounds_hex_validation():
    with pytest.raises(ValueError, match="strictly positive"):
        split_bounds_hex({"a": 1.0, "b": 0.0})
    with pytest.raises(ValueError, match="resolution"):
        split_bounds_hex({"a": 1.0, "b": 1e-16})
    b = split_bounds_hex({"a": 0.5, "b": 0.5})
    assert b[-1][1] == "g" * 12  # exhaustive upper bound sorts above hex
    assert b[0][1] < b[-1][1]


def test_fixture_pairs_never_straddle(spark, sf_dir):
    from vectordb_similarity_search_spark.operators.dedup import (
        embedding_neardup_blocked,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = embedding_neardup_blocked(emb, threshold=0.4)
    asg = cluster_aware_split(emb, pairs, W, id_col="vec_id")
    leaks = (
        pairs.join(
            asg.select(F.col("vec_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            asg.select(F.col("vec_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert leaks == 0
