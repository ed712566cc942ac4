"""Mergeable HLL sketch ledger guarantees (operators/sketches.py).

The oracle for the catalog queries is expected-parquet (HLL estimates
are not SQL-reproducible), so these tests carry the semantic load:
accuracy vs exact distinct counts, layout/merge-order independence
(the determinism contract the fixture oracle rests on), and
incremental-merge == full-rebuild parity.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.sketches import (
    daily_hll_sketches,
    rolling_distinct,
    rollup_distinct,
    sketch_ledger_merge_batch,
    sketch_ledger_write,
)


@pytest.fixture(scope="module")
def events(spark):
    # 40k deterministic events over 21 days, 3 types, heavy user reuse
    # (so distinct << count and windows genuinely dedupe across days)
    return (
        spark.range(40_000)
        .select(
            (
                F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                + F.make_interval(hours=F.pmod(F.xxhash64("id"), F.lit(21 * 24)))
            ).alias("ts"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2500)).alias("user_id"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("buy")),
                (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(3)) + 1).cast("int"),
            ).alias("event_type"),
        )
        .cache()
    )


def _exact_rolling(spark, events, window_days=7):
    base = events.select(F.to_date("ts").alias("day"), "user_id")
    days = base.select("day").distinct().select(F.col("day").alias("out_day"))
    joined = days.join(
        base,
        (F.col("day") <= F.col("out_day"))
        & (F.col("day") > F.date_sub(F.col("out_day"), window_days)),
    )
    return {
        r["out_day"]: r["d"]
        for r in joined.groupBy("out_day")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }


def test_rolling_estimates_close_to_exact(spark, events):
    ledger = daily_hll_sketches(events)
    got = {
        dt.date.fromisoformat(str(r["day"])): r["est_distinct"]
        for r in rolling_distinct(ledger, 7).collect()
    }
    exact = _exact_rolling(spark, events, 7)
    assert set(got) == set(exact)
    for day, est in got.items():
        # lg_k=12 -> ~0.8% RSE; 5% is a >6-sigma bound, safe for a pin
        assert abs(est - exact[day]) / exact[day] < 0.05, (day, est, exact[day])


def test_rollup_estimates_close_to_exact_and_not_sum(spark, events):
    ledger = daily_hll_sketches(events)
    got = {r["scope"]: r["est_distinct"] for r in rollup_distinct(ledger).collect()}
    exact_total = events.select("user_id").distinct().count()
    per_type = {
        "type:" + r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert abs(got["total"] - exact_total) / exact_total < 0.05
    for k, ex in per_type.items():
        assert abs(got[k] - ex) / ex < 0.05, (k, got[k], ex)
    # the union must DEDUPE across types: with heavy user reuse the sum
    # of per-type distincts wildly exceeds the true total
    assert sum(per_type.values()) > 1.5 * exact_total
    assert got["total"] < 1.2 * exact_total


def test_estimates_layout_independent(spark, events):
    """The determinism contract behind the expected-parquet oracle:
    identical estimates whatever the partitioning."""
    a = sorted(
        (str(r["day"]), r["n_events"], r["est_distinct"])
        for r in rolling_distinct(daily_hll_sketches(events), 7).collect()
    )
    b = sorted(
        (str(r["day"]), r["n_events"], r["est_distinct"])
        for r in rolling_distinct(
            daily_hll_sketches(events.repartition(13, "event_type")), 7
        ).collect()
    )
    assert a == b


def test_leaf_union_equals_direct_sketch(spark, events):
    """Merge invariance: the union of per-day-type leaf sketches must
    estimate EXACTLY what one direct sketch over all rows estimates —
    the property that makes pre-aggregation lossless."""
    ledger = daily_hll_sketches(events)
    via_leaves = (
        ledger.agg(F.hll_union_agg("sk").alias("u"))
        .select(F.hll_sketch_estimate("u").cast("long").alias("e"))
        .first()["e"]
    )
    direct = (
        events.agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("s"))
        .select(F.hll_sketch_estimate("s").cast("long").alias("e"))
        .first()["e"]
    )
    assert via_leaves == direct


def test_incremental_merge_matches_full_rebuild(spark, events, tmp_path):
    """Ledger maintenance: sketch history once, fold a new batch in via
    sketch_ledger_merge_batch — estimates must equal a full rebuild over
    the union of rows, bit-for-bit, and the sketch column must survive
    the parquet round-trip."""
    old = events.filter(F.to_date("ts") < F.lit("2026-01-15"))
    new = events.filter(F.to_date("ts") >= F.lit("2026-01-15"))
    path = str(tmp_path / "ledger")
    n = sketch_ledger_write(daily_hll_sketches(old), path)
    assert n > 0
    merged = sketch_ledger_merge_batch(spark, new, path)
    rebuilt = daily_hll_sketches(events)

    def estimates(ledger):
        return sorted(
            (str(r["day"]), r["event_type"], r["n_events"], r["e"])
            for r in ledger.select(
                "day",
                "event_type",
                "n_events",
                F.hll_sketch_estimate("sk").cast("long").alias("e"),
            ).collect()
        )

    assert estimates(merged) == estimates(rebuilt)


def test_validation():
    # both validate their scalars before touching the frame
    with pytest.raises(ValueError, match="lg_k"):
        daily_hll_sketches(None, lg_k=3)
    with pytest.raises(ValueError, match="window_days"):
        rolling_distinct(None, 0)


def test_rolling_by_type_matches_exact_and_full_rolling(spark, events):
    """Per-type trailing windows: each (day, type) estimate within the
    HLL bound of the exact per-type distinct, and NOT derivable by
    splitting the all-types number (union semantics per type)."""
    from vectordb_similarity_search_spark.operators.sketches import (
        rolling_distinct_by_type,
    )

    ledger = daily_hll_sketches(events)
    got = {
        (str(r["day"]), r["event_type"]): r["est_distinct"]
        for r in rolling_distinct_by_type(ledger, 7).collect()
    }
    base = events.select(
        F.to_date("ts").alias("day"), "event_type", "user_id"
    )
    days = base.select("day").distinct().select(F.col("day").alias("out_day"))
    contrib = base.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("_o"),
        "day",
        "event_type",
        "user_id",
    ).select(F.date_add("day", "_o").alias("out_day"), "event_type", "user_id")
    exact = {
        (str(r["out_day"]), r["event_type"]): r["d"]
        for r in contrib.join(F.broadcast(days), "out_day", "left_semi")
        .groupBy("out_day", "event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_sketch_plans_stay_scale_shaped(spark, events):
    """Pin the plan shapes the 100-TB story depends on: the ledger build
    is ONE exchange with map-side partials; the rolling query joins the
    day dimension by BROADCAST (no BNLJ, no sort-merge on the tiny
    side)."""
    from tests.conftest import plan_of

    ledger = daily_hll_sketches(events)
    p_build = plan_of(ledger)
    tree = p_build.split("(1)")[0]
    assert tree.count("Exchange") == 1, tree
    assert "partial_hll_sketch_agg" in p_build or "partial" in p_build, p_build

    p_roll = plan_of(rolling_distinct(ledger, 7))
    assert "BroadcastNestedLoopJoin" not in p_roll
    assert "CartesianProduct" not in p_roll
    assert "BroadcastHashJoin" in p_roll, p_roll
