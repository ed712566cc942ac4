"""Snapshot versioning / time travel (operators/timetravel.py)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.diff import diff_summary
from vectordb_similarity_search_spark.operators.merge import merge_parquet
from vectordb_similarity_search_spark.operators.timetravel import (
    list_versions,
    read_version,
    recover_history,
)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(100)],
        "k int, s string, v double",
    ).coalesce(2).write.parquet(path)
    return path


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k int, s string, v double")


def test_versions_accumulate_and_read_back(spark, table):
    v0 = {(r.k, r.s, r.v) for r in spark.read.parquet(table).collect()}
    merge_parquet(
        spark, table, _batch(spark, [(1, "s1", 99.0)]), ["k"],
        retain_history=5,
    )
    merge_parquet(
        spark, table, _batch(spark, [(200, "new", 1.0)]), ["k"],
        retain_history=5,
    )
    assert list_versions(table) == [1, 2]
    # v1 is the ORIGINAL table; v2 has the first merge applied
    got1 = {(r.k, r.s, r.v) for r in read_version(spark, table, 1).collect()}
    assert got1 == v0
    got2 = {r.v for r in read_version(spark, table, 2).filter(F.col("k") == 1).collect()}
    assert got2 == {99.0}
    # current has both
    cur = spark.read.parquet(table)
    assert cur.count() == 101
    # _history is invisible to current-table reads (underscore dir)
    assert cur.filter(F.col("k") == 1).head().v == 99.0


def test_diff_against_version_reports_the_merge(spark, table):
    merge_parquet(
        spark, table,
        _batch(spark, [(1, "s1", 99.0), (300, "add", 3.0)]),
        ["k"], retain_history=5,
    )
    rep = {
        r.metric: r.n
        for r in diff_summary(
            read_version(spark, table, 1), spark.read.parquet(table), ["k"]
        ).collect()
    }
    assert rep["rows_added"] == 1
    assert rep["rows_changed"] == 1
    assert rep["rows_removed"] == 0
    assert rep["rows_same"] == 99
    assert rep["col_changed_v"] == 1 and rep["col_changed_s"] == 0


def test_retention_prunes_oldest(spark, table):
    for i in range(4):
        merge_parquet(
            spark, table, _batch(spark, [(i, "x", -1.0)]), ["k"],
            retain_history=2,
        )
    assert list_versions(table) == [3, 4]
    with pytest.raises(ValueError, match="not retained"):
        read_version(spark, table, 1)


def test_crash_between_swap_and_archive_recovers(spark, table):
    """Simulate the documented crash window: table live, previous
    snapshot still parked at __old_*. recover_history (run by the next
    versioned merge on entry) must archive it as the next version."""
    park = table + "__old_deadbeef"
    shutil.copytree(table, park)
    assert recover_history(table)
    assert list_versions(table) == [1]
    assert not os.path.exists(park)
    # and a subsequent versioned merge numbers itself after it
    merge_parquet(
        spark, table, _batch(spark, [(1, "s1", 99.0)]), ["k"],
        retain_history=5,
    )
    assert list_versions(table) == [1, 2]


def test_unversioned_merge_keeps_no_history(spark, table):
    merge_parquet(spark, table, _batch(spark, [(1, "s1", 99.0)]), ["k"])
    assert list_versions(table) == []


def test_cdc_stream_retains_per_batch_versions(spark, tmp_path):
    """Streaming CDC with retain_history: each micro-batch's pre-state
    stays queryable — replayed through a memory-source stream."""
    from vectordb_similarity_search_spark.streaming.events import (
        cdc_merge_stream,
    )

    path = str(tmp_path / "cdc_tbl")
    spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k int, v double"
    ).coalesce(1).write.parquet(path)
    src_rows = [(1, 100.0), (2, 200.0)]
    batches = spark.createDataFrame(src_rows, "k int, v double")
    # drive two single-row batches through foreachBatch directly (the
    # streaming wiring itself is covered by test_streaming's CDC tests)
    import vectordb_similarity_search_spark.operators.merge as M

    for i, row in enumerate(src_rows):
        b = spark.createDataFrame([row], "k int, v double")
        M.merge_parquet(spark, path, b, ["k"], retain_history=3)
    assert list_versions(path) == [1, 2]
    assert read_version(spark, path, 1).filter(F.col("k") == 1).head().v == 1.0
    assert read_version(spark, path, 2).filter(F.col("k") == 1).head().v == 100.0
    cur = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert cur[1] == 100.0 and cur[2] == 200.0
    # and the partitioned streaming path refuses the flag AT CALL TIME
    # (not per batch: the conflict is a config error, not a data error)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="retain_history"):
        cdc_merge_stream(
            batches, path, ["k"], str(tmp_path / "chk"),
            partition_by=["k"], retain_history=3,
        )


def test_crash_recovery_with_retained_versions_keeps_chronology(spark, table):
    """Round-4 review repro: a crash after swap leaves the park CARRYING
    the retained history. Recovery must hoist that history BEFORE
    numbering — the old code restarted at v1 and either crashed
    (ENOTEMPTY) or archived the newest snapshot under the lowest
    number, inverting read_version chronology and making retention
    prune the newest data first."""
    # build v1 via a normal versioned merge
    merge_parquet(
        spark, table, _batch(spark, [(1, "s1", 99.0)]), ["k"],
        retain_history=5,
    )
    assert list_versions(table) == [1]
    # simulate the crash window: park the CURRENT table (which carries
    # _history/v1) and put a newer snapshot in its place
    park = table + "__old_cafebabe"
    os.rename(table, park)
    shutil.copytree(park, table)
    # the park still holds _history; the live copy got it too — strip the
    # live one so the layout matches the real crash (new snapshot has no
    # history until hoist)
    shutil.rmtree(os.path.join(table, "_history"))
    assert recover_history(table)
    # hoisted v1 kept its number; the park became v2 — chronology intact
    assert list_versions(table) == [1, 2]
    v1 = read_version(spark, table, 1)
    assert v1.filter(F.col("k") == 1).head().v == 1.0  # the ORIGINAL state
    v2 = read_version(spark, table, 2)
    assert v2.filter(F.col("k") == 1).head().v == 99.0  # post-merge state


def test_vacuum_versions_prunes_and_keeps_readable(spark, table):
    """Round-9 VERDICT #6: retention-bounded vacuum — versions beyond
    keep_last deleted, kept versions still readable, validation on the
    knob."""
    from vectordb_similarity_search_spark.operators.timetravel import (
        vacuum_versions,
    )

    for i in range(4):
        merge_parquet(
            spark, table, _batch(spark, [(i, "x", -1.0)]), ["k"],
            retain_history=10,
        )
    assert list_versions(table) == [1, 2, 3, 4]
    assert vacuum_versions(table, keep_last=2) == [1, 2]
    assert list_versions(table) == [3, 4]
    assert read_version(spark, table, 3).count() == 100
    with pytest.raises(ValueError, match="not retained"):
        read_version(spark, table, 1)
    # idempotent; keep_last larger than retained is a no-op
    assert vacuum_versions(table, keep_last=2) == []
    assert vacuum_versions(table, keep_last=99) == []
    with pytest.raises(ValueError, match="keep_last"):
        vacuum_versions(table, keep_last=0)


def test_vacuum_refuses_torn_swap_and_recovers_live_parks(spark, table):
    """A mid-swap torn table (live dir missing, park present) must be
    REFUSED — vacuuming around a torn swap could GC the only surviving
    lineage; a LIVE table with a parked snapshot is recovered (park
    archived as a version) before retention is applied."""
    from vectordb_similarity_search_spark.operators.timetravel import (
        vacuum_versions,
    )

    merge_parquet(
        spark, table, _batch(spark, [(1, "s1", 9.0)]), ["k"],
        retain_history=5,
    )
    # live + park: recover-then-prune counts the park as a version
    park = table + "__old_cafe0001"
    shutil.copytree(table, park)
    assert vacuum_versions(table, keep_last=1) == [1]
    assert list_versions(table) == [2]
    assert not os.path.exists(park)

    # torn: live dir missing, park present -> refuse
    os.rename(table, table + "__old_dead0002")
    with pytest.raises(RuntimeError, match="mid-swap"):
        vacuum_versions(table, keep_last=1)
    # restore for tmp_path hygiene
    os.rename(table + "__old_dead0002", table)

    with pytest.raises(ValueError, match="no table"):
        vacuum_versions(str(table) + "_missing", keep_last=1)


def test_compact_preserves_history_and_vacuums(spark, table):
    """Round-9: compaction of a VERSIONED table must carry _history
    across the snapshot swap (it used to die with the old snapshot) and
    can run retention GC as part of the same scheduled pass."""
    from vectordb_similarity_search_spark.operators.compact import (
        compact_parquet,
    )

    for i in range(3):
        merge_parquet(
            spark, table, _batch(spark, [(i, "y", 7.0)]), ["k"],
            retain_history=10,
        )
    assert list_versions(table) == [1, 2, 3]
    before = {(r.k, r.s, r.v) for r in spark.read.parquet(table).collect()}

    rep = compact_parquet(spark, table, target_file_bytes=1 << 30,
                          vacuum_keep=2)
    # tiny table -> single target file; rewrite happened (2 input files)
    assert rep["rewritten"] is True
    assert rep["vacuumed_versions"] == [1]
    assert list_versions(table) == [2, 3]
    after = {(r.k, r.s, r.v) for r in spark.read.parquet(table).collect()}
    assert after == before
    assert read_version(spark, table, 2).count() == 100

    # a second compaction is a no-op rewrite but GC still applies
    rep2 = compact_parquet(spark, table, target_file_bytes=1 << 30,
                           vacuum_keep=1)
    assert rep2["rewritten"] is False
    assert rep2["vacuumed_versions"] == [2]
    assert list_versions(table) == [3]
