"""The sketch-audit cell-parity helper (plans/nonsql_queries._cells_match).

Pins the truth table the audit booleans depend on (round 9 measured a
union + two-level-aggregate rewrite of the full-outer join as ~1 s
SLOWER — the oneshot aggregates' partitioning is reused by the join but
not by a union aggregate — so the full-outer form stays; these tests
keep any future rewrite honest):

- both sides present, equal non-null values  -> cell matches
- value differing                            -> False
- present on exactly one side                -> False
- value NULL on either or both sides         -> False (a null cell
  value can never attest parity — the old coalesce(_sv == _ov, False)
  semantics)
- the per-keys boolean is the AND over that group's cells
- value=None (presence-only mode, theta's hash sets): both-sides
  presence is the match
"""

from __future__ import annotations

from vectordb_similarity_search_spark.plans.nonsql_queries import (
    _cells_match,
)


def _rows(df):
    return {
        tuple(r[k] for k in ("g",)) + (r["match"],) for r in df.collect()
    }


def test_cells_match_truth_table(spark):
    schema = "g string, c long, v double"
    stream = spark.createDataFrame(
        [
            ("ok", 1, 1.5),  # matching cell
            ("ok", 2, 2.5),  # matching cell
            ("diff", 1, 1.0),  # value differs
            ("stream_only", 1, 1.0),  # missing from oneshot
            ("null_both", 1, None),  # null on both sides
            ("null_one", 1, 3.0),  # null on the oneshot side
        ],
        schema,
    )
    oneshot = spark.createDataFrame(
        [
            ("ok", 1, 1.5),
            ("ok", 2, 2.5),
            ("diff", 1, 9.0),
            ("oneshot_only", 1, 1.0),  # missing from stream
            ("null_both", 1, None),
            ("null_one", 1, None),
        ],
        schema,
    )
    got = {
        (r["g"], r["match"])
        for r in _cells_match(stream, oneshot, ["g"], ["c"], "v").collect()
    }
    assert got == {
        ("ok", True),
        ("diff", False),
        ("stream_only", False),
        ("oneshot_only", False),
        ("null_both", False),
        ("null_one", False),
    }


def test_cells_match_group_and_over_cells(spark):
    # one bad cell flips the whole group even when others match
    schema = "g string, c long, v double"
    stream = spark.createDataFrame(
        [("mix", 1, 1.0), ("mix", 2, 2.0)], schema
    )
    oneshot = spark.createDataFrame(
        [("mix", 1, 1.0), ("mix", 2, 99.0)], schema
    )
    got = _cells_match(stream, oneshot, ["g"], ["c"], "v").collect()
    assert [(r["g"], r["match"]) for r in got] == [("mix", False)]


def test_cells_match_presence_only_mode(spark):
    # value=None: presence IS the cell (theta's hash-set parity)
    schema = "g string, h long"
    stream = spark.createDataFrame(
        [("ok", 10), ("ok", 11), ("miss", 10)], schema
    )
    oneshot = spark.createDataFrame(
        [("ok", 10), ("ok", 11), ("miss", 10), ("miss", 11)], schema
    )
    got = {
        (r["g"], r["match"])
        for r in _cells_match(stream, oneshot, ["g"], ["h"]).collect()
    }
    assert got == {("ok", True), ("miss", False)}
