"""Declarative validation suite (operators/validate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from vectordb_similarity_search_spark.operators.validate import (
    check_suite,
    foreign_key,
    in_range,
    not_null,
    row_count_between,
    unique,
    values_in,
)

from .conftest import SMOKE_SF, plan_of


def _df(spark):
    return spark.createDataFrame(
        [
            Row(id=1, cat="a", x=5.0),
            Row(id=2, cat="b", x=-1.0),  # range violation
            Row(id=2, cat="zz", x=2.0),  # dup id + bad cat
            Row(id=None, cat="a", x=None),  # null id
        ]
    )


def test_each_check_counts_violations(spark):
    got = {
        r["check_name"]: (r["violations"], r["passed"])
        for r in check_suite(
            _df(spark),
            [
                not_null("id"),
                unique("id"),
                in_range("x", lo=0.0),
                values_in("cat", ["a", "b"]),
                row_count_between(1, 10),
                row_count_between(5, 10),
            ],
        ).collect()
    }
    assert got["not_null(id)"] == (1, False)
    # 4 rows, 2 distinct non-null ids -> 2 violations (the NULL-keyed row
    # counts: uniqueness of a key with NULLs must fail loudly)
    assert got["unique(id)"] == (2, False)
    assert got["in_range(x,0.0..)"] == (1, False)  # NULL allowed by default
    assert got["values_in(cat)"] == (1, False)
    assert got["row_count_between(1,10)"] == (0, True)
    assert got["row_count_between(5,10)"] == (1, False)  # distance below band


def test_null_strictness_flags(spark):
    got = {
        r["check_name"]: r["violations"]
        for r in check_suite(
            _df(spark),
            [
                in_range("x", lo=0.0, hi=10.0, allow_null=False),
                values_in("cat", ["a", "b", "zz"], allow_null=False),
            ],
        ).collect()
    }
    assert got["in_range(x,0.0..10.0)"] == 2  # -1.0 and the NULL
    assert got["values_in(cat)"] == 0  # no NULL cats, all allowed


def test_foreign_key_orphans(spark):
    child = spark.createDataFrame(
        [Row(fk=1), Row(fk=2), Row(fk=99), Row(fk=None)]
    )
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    r = foreign_key(child, "fk", parent, "pk").collect()[0]
    assert (r["check_name"], r["violations"], r["passed"]) == (
        "foreign_key(fk)",
        1,  # 99 is an orphan; NULL fk is not_null's concern
        False,
    )


def test_suite_is_single_scan(spark):
    """The 100 TB contract: N non-distinct checks must not become N scans."""
    from vectordb_similarity_search_spark.sources.tables import load_table

    o = load_table(spark, SMOKE_SF, "orders")
    suite = check_suite(
        o,
        [
            not_null("o_custkey"),
            in_range("o_totalprice", lo=0),
            values_in("o_orderstatus", ["O", "F", "P"]),
            row_count_between(1),
        ],
    )
    import re

    assert (
        len(re.findall(r"^\(\d+\) Scan parquet", plan_of(suite), flags=re.M))
        == 1
    )


def test_validation_errors():
    with pytest.raises(ValueError):
        check_suite(None, [])
    with pytest.raises(ValueError):
        in_range("x")
    with pytest.raises(ValueError):
        check_suite(None, [not_null("a"), not_null("a")])
