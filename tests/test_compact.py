"""Compaction: fewer files, identical content, untouched partitions
byte-identical, clustered layouts stay prunable."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.compact import (
    compact_parquet,
    compact_parquet_partitioned,
    small_file_report,
)
from vectordb_similarity_search_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _content(spark, path):
    df = spark.read.parquet(path)
    cols = sorted(df.columns)
    return df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")
        ).alias("h"),
    ).head()


def _files(path):
    return sorted(glob.glob(os.path.join(path, "**", "part-*.parquet"), recursive=True))


def test_flat_compaction_preserves_content(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    path = str(tmp_path / "li")
    li.repartition(32).write.parquet(path)
    assert len(_files(path)) == 32
    before = _content(spark, path)

    rep = small_file_report(path)
    assert rep["worth_compacting"] and rep["n_files"] == 32

    res = compact_parquet(spark, path)
    assert res["rewritten"] and res["files_after"] < res["files_before"]
    assert len(_files(path)) == res["files_after"]
    assert _content(spark, path) == before


def test_compaction_is_idempotent_noop(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    path = str(tmp_path / "li2")
    li.repartition(16).write.parquet(path)
    compact_parquet(spark, path)
    stamps = {f: os.path.getmtime(f) for f in _files(path)}
    res = compact_parquet(spark, path)
    assert not res["rewritten"]
    assert {f: os.path.getmtime(f) for f in _files(path)} == stamps


def test_compaction_with_sort_cols_stays_prunable(spark, tmp_path):
    """Re-clustering compaction: the output is range-clustered on
    sort_cols with a fresh zone-map sidecar, so selective reads still
    prune (compaction must not turn a clustered table into a shuffled
    one)."""
    from vectordb_similarity_search_spark.sources.zonemap import prune_files

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "li3")
    li.repartition(32).write.parquet(path)

    # force a multi-file result so disjointness is a real claim
    total = sum(os.path.getsize(f) for f in _files(path))
    before = _content(spark, path)
    res = compact_parquet(
        spark, path, target_file_bytes=total // 4, sort_cols=["l_orderkey"]
    )
    assert res["rewritten"] and 2 <= res["files_after"] < 32
    assert os.path.exists(os.path.join(path, "_zonemap.json"))
    assert _content(spark, path) == before

    lo = spark.read.parquet(path).agg(F.min("l_orderkey")).head()[0]
    kept, n = prune_files(path, {"l_orderkey": (lo, lo + 5)})
    assert n == res["files_after"] and len(kept) <= 2


def test_partitioned_compaction_touches_only_fragmented_dirs(spark, tmp_path):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    path = str(tmp_path / "orders_p")
    orders.repartition(1).write.partitionBy("o_orderpriority").parquet(path)
    dirs = sorted(glob.glob(os.path.join(path, "o_orderpriority=*")))
    assert len(dirs) >= 3
    for d in dirs:
        assert len(_files(d)) == 1

    # fragment exactly ONE partition dir with an 8-file append
    frag = dirs[0]
    val = os.path.basename(frag).split("=", 1)[1].replace("%20", " ")
    extra = orders.filter(F.col("o_orderpriority") == val).drop("o_orderpriority")
    extra.repartition(8).write.mode("append").parquet(frag)
    assert len(_files(frag)) == 9
    before = _content(spark, path)
    untouched_stamps = {
        f: os.path.getmtime(f) for d in dirs[1:] for f in _files(d)
    }

    res = compact_parquet_partitioned(spark, path, ["o_orderpriority"])
    assert res["rewritten"] and res["dirs_touched"] == 1
    assert len(_files(frag)) == 1
    # untouched dirs: same files, same mtimes (never rewritten)
    assert {
        f: os.path.getmtime(f) for d in dirs[1:] for f in _files(d)
    } == untouched_stamps
    # content identical, partition column included via the hive dirs
    assert _content(spark, path) == before


def test_partitioned_compaction_noop(spark, tmp_path):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    path = str(tmp_path / "orders_n")
    orders.repartition(1).write.partitionBy("o_orderpriority").parquet(path)
    res = compact_parquet_partitioned(spark, path, ["o_orderpriority"])
    assert not res["rewritten"] and res["dirs_touched"] == 0


def test_partitioned_compaction_rejects_wrong_column_order(spark, tmp_path):
    """partition_cols out of on-disk nesting order would mis-key the
    broadcast join and (pre-guard) delete whole partitions as 'empty' —
    it must raise with the table untouched."""
    df = spark.createDataFrame(
        [(i, f"a{i % 2}", f"b{i % 3}", float(i)) for i in range(60)],
        "k long, pa string, pb string, val double",
    )
    path = str(tmp_path / "two_level")
    df.repartition(4).write.partitionBy("pa", "pb").parquet(path)
    before = _content(spark, path)
    import pytest

    with pytest.raises(ValueError, match="on-disk partition nesting"):
        compact_parquet_partitioned(spark, path, ["pb", "pa"])
    assert _content(spark, path) == before

    res = compact_parquet_partitioned(spark, path, ["pa", "pb"])
    assert res["rewritten"] and _content(spark, path) == before
