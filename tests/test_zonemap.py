"""Zone-map file pruning: skipping is a pure superset screen (results
always equal full-scan + filter), clustered layouts actually prune, and
the conservative paths (appended files, stat-less columns, empty match)
stay correct."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.sources.io import (
    write_sorted,
    write_zordered,
)
from vectordb_similarity_search_spark.sources.tables import load_table
from vectordb_similarity_search_spark.sources.zonemap import (
    prune_files,
    pruned_scan,
    write_zone_map,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_zordered_pruned_scan_matches_full_filter(spark, tmp_path):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "orders_z")
    write_zordered(orders, path, ["o_custkey", "o_totalprice"], n_files=16)
    write_zone_map(path, ["o_custkey", "o_totalprice"])

    lo, hi = orders.agg(F.min("o_custkey"), F.max("o_custkey")).head()
    span = (hi - lo) // 10
    preds = {
        "o_custkey": (lo, lo + span),
        "o_totalprice": (50_000.0, None),  # half-open
    }
    kept, total = prune_files(path, preds)
    assert total == 16
    assert len(kept) < total  # z-order + narrow predicate must skip files

    got = pruned_scan(spark, path, preds)
    want = orders.filter(
        (F.col("o_custkey") >= lo)
        & (F.col("o_custkey") <= lo + span)
        & (F.col("o_totalprice") >= 50_000.0)
    )
    assert _rows(got) == _rows(want)


def test_sorted_layout_prunes_to_one_file(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "li_sorted")
    write_sorted(li, path, ["l_orderkey"], n_files=8)
    write_zone_map(path, ["l_orderkey"])

    lo = li.agg(F.min("l_orderkey")).head()[0]
    preds = {"l_orderkey": (lo, lo + 5)}
    kept, total = prune_files(path, preds)
    # disjoint file ranges: a 6-key range lands in at most 2 files
    assert total == 8 and len(kept) <= 2

    got = pruned_scan(spark, path, preds)
    want = li.filter(F.col("l_orderkey").between(lo, lo + 5))
    assert _rows(got) == _rows(want)


def test_appended_file_is_conservatively_scanned(spark, tmp_path):
    """Files that land after the sidecar was written are unknown to the
    zone map and must be KEPT — append never silently loses rows."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "li_app")
    write_sorted(li, path, ["l_orderkey"], n_files=4)
    write_zone_map(path, ["l_orderkey"])

    lo = li.agg(F.min("l_orderkey")).head()[0]
    appended = li.filter(F.col("l_orderkey") == lo).limit(5).toPandas()
    import pyarrow as pa

    pq.write_table(
        pa.Table.from_pandas(appended, preserve_index=False),
        os.path.join(path, "part-appended-after-sidecar.parquet"),
    )

    preds = {"l_orderkey": (lo, lo)}
    kept, total = prune_files(path, preds)
    assert total == 5
    assert any("appended" in f for f in kept)

    base = li.filter(F.col("l_orderkey") == lo).count()
    assert pruned_scan(spark, path, preds).count() == base + len(appended)


def test_statless_column_never_prunes(spark, tmp_path):
    """A predicate on a column the sidecar has no stats for keeps every
    file (and the row filter still applies)."""
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "li_nostat")
    write_sorted(li, path, ["l_orderkey"], n_files=4)
    write_zone_map(path, ["l_orderkey"])  # sidecar knows only l_orderkey

    preds = {"l_quantity": (1.0, 2.0)}
    kept, total = prune_files(path, preds)
    assert len(kept) == total

    got = pruned_scan(spark, path, preds)
    want = li.filter(F.col("l_quantity").between(1.0, 2.0))
    assert _rows(got) == _rows(want)


def test_empty_match_returns_empty_frame_with_schema(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "li_empty")
    write_sorted(li, path, ["l_orderkey"], n_files=4)
    write_zone_map(path, ["l_orderkey"])

    hi = li.agg(F.max("l_orderkey")).head()[0]
    preds = {"l_orderkey": (hi + 1_000_000, None)}
    kept, _ = prune_files(path, preds)
    assert kept == []

    got = pruned_scan(spark, path, preds)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["l_orderkey", "l_quantity"]


def test_footer_fallback_without_sidecar(spark, tmp_path):
    """No sidecar: prune_files collects footer stats directly (the
    first-read path before a zone map has been committed)."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "li_nosc")
    write_sorted(li, path, ["l_orderkey"], n_files=8)
    assert not glob.glob(os.path.join(path, "_zonemap.json"))

    lo = li.agg(F.min("l_orderkey")).head()[0]
    kept, total = prune_files(path, {"l_orderkey": (lo, lo + 5)})
    assert total == 8 and len(kept) <= 2
