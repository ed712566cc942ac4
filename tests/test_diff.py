"""Keyed table diff / reconciliation (operators/diff.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.diff import (
    diff_summary,
    table_diff,
)


def _sides(spark):
    left = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", None),
            (3, "c", 30.0),
            (4, "d", 40.0),
        ],
        "k int, s string, v double",
    )
    right = spark.createDataFrame(
        [
            (1, "a", 10.0),      # same
            (2, "b", None),      # same (NULL-safe)
            (3, "c", 31.0),      # changed (v)
            (5, "e", 50.0),      # added
        ],
        "k int, s string, v double",
    )
    return left, right


def test_table_diff_statuses(spark):
    left, right = _sides(spark)
    rows = {r.k: r["_diff_status"] for r in table_diff(left, right, ["k"]).collect()}
    assert rows == {1: "same", 2: "same", 3: "changed", 4: "removed", 5: "added"}


def test_diff_summary_counts(spark):
    left, right = _sides(spark)
    got = {r.metric: r.n for r in diff_summary(left, right, ["k"]).collect()}
    assert got == {
        "rows_added": 1,
        "rows_removed": 1,
        "rows_changed": 1,
        "rows_same": 2,
        "col_changed_s": 0,
        "col_changed_v": 1,
    }


def test_table_diff_null_vs_value_is_changed(spark):
    left = spark.createDataFrame([(1, None)], "k int, v double")
    right = spark.createDataFrame([(1, 0.0)], "k int, v double")
    assert table_diff(left, right, ["k"]).head()["_diff_status"] == "changed"


def test_table_diff_duplicate_keys_raise(spark):
    left = spark.createDataFrame([(1, "a"), (1, "b")], "k int, s string")
    right = spark.createDataFrame([(1, "a")], "k int, s string")
    with pytest.raises(Exception) as ei:
        table_diff(left, right, ["k"]).collect()
    assert "duplicate key" in str(ei.value)


def test_table_diff_validation(spark):
    df = spark.createDataFrame([(1, "a")], "k int, s string")
    other = spark.createDataFrame([(1, 2)], "k int, n int")
    with pytest.raises(ValueError, match="key columns"):
        table_diff(df, df, [])
    with pytest.raises(ValueError, match="schemas differ"):
        table_diff(df, other, ["k"])


def test_diff_summary_is_single_sort_merge_join(spark):
    """Reconciliation plan shape: one SortMergeJoin FullOuter, no
    broadcast of either side, one aggregate."""
    left, right = _sides(spark)
    from .conftest import plan_of

    plan = plan_of(diff_summary(left, right, ["k"]))
    # tree lines look like "SortMergeJoin FullOuter (12)" (the detail
    # section repeats each node, so count tree occurrences only)
    assert plan.count("SortMergeJoin FullOuter (") == 1, plan


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_diff_reports_exactly_the_applied_edits(spark, data):
    """Property: apply a random known edit set (adds / removes / value
    changes) to a random base table — diff_summary must report exactly
    those edits, nothing else."""
    n = data.draw(st.integers(min_value=5, max_value=40))
    keys = list(range(n))
    removed = set(data.draw(st.sets(st.sampled_from(keys), max_size=n // 3)))
    remaining = [k for k in keys if k not in removed]
    changed = set(
        data.draw(st.sets(st.sampled_from(remaining or [0]), max_size=n // 3))
    ) - removed if remaining else set()
    n_added = data.draw(st.integers(min_value=0, max_value=5))
    base_rows = [(k, float(k)) for k in keys]
    right_rows = [
        (k, float(k) + (1.0 if k in changed else 0.0)) for k in remaining
    ] + [(1000 + i, -1.0) for i in range(n_added)]
    left = spark.createDataFrame(base_rows, "k int, v double")
    right = spark.createDataFrame(right_rows, "k int, v double")
    rep = {r.metric: r.n for r in diff_summary(left, right, ["k"]).collect()}
    assert rep["rows_removed"] == len(removed)
    assert rep["rows_changed"] == len(changed)
    assert rep["rows_added"] == n_added
    assert rep["rows_same"] == len(remaining) - len(changed)
    assert rep["col_changed_v"] == len(changed)
