"""bench.py output-contract guards (no Spark session needed).

Round-4 BENCH was unparseable because the one stdout JSON line outgrew
the driver's bounded tail capture; round 5 split the contract into
bench_result.json (detail) + a compact final line. These tests pin the
parts of that contract that can silently rot as query groups grow."""

from __future__ import annotations

import json
import os

import bench


def _compact_shape() -> dict:
    # mirror bench.main()'s compact dict with worst-case float widths
    return {
        "metric": "headline_queries_total_wall",
        "value": 9999.999,
        "unit": "sec",
        "queries": {q: 9999.999 for q in bench.HEADLINE},
        "pipeline_total_wall": 9999.999,
        "ann_total_wall": 9999.999,
        "analytics_total_wall": 9999.999,
        "write_total_wall": 9999.999,
        "machine_factor": 99.999,
        "machine_factor_io": 99.999,
        "blend_factor": 99.999,
        "normalized_total": 9999.999,
        "detail": "bench_result.json",
        "protocol": "warm1_min3",
        "sf": 0.1,
    }


def test_compact_line_fits_tail_capture():
    """The FINAL stdout line must stay under bench.py's own 1500-char
    degradation threshold even at worst-case number widths — growing
    HEADLINE past that silently drops the per-query map from the line
    (by design), and this test makes the growth visible at review time
    instead."""
    line = json.dumps(_compact_shape())
    assert len(line) < 1500, (
        f"compact bench line would be {len(line)} chars at worst-case "
        "widths; HEADLINE grew too large for the driver tail capture"
    )


def test_bench_groups_cover_all_pins():
    """Every pinned query must still be produced by some bench group —
    the bench_compare --pins gate fails on MISSING pins, so catch the
    drift here first, without running the bench."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "bench_pins.json")) as fh:
        pins = json.load(fh)
    produced = {
        "headline": set(bench.HEADLINE),
        "pipeline": set(bench.PIPELINE),
        "ann": set(bench.ANN),
        "analytics": set(bench.ANALYTICS),
        # the write group's keys are fixed in run_write_group
        "write": {
            "write_merge_cdc_lineitem",
            "write_merge_pruned_lineitem",
            "write_scd2_customer",
            "write_zorder_orders",
        },
    }
    missing = {
        group: sorted(set(qs) - produced[group])
        for group, qs in pins["groups"].items()
        if set(qs) - produced.get(group, set())
    }
    assert not missing, missing


def test_bench_group_names_resolve_in_registry():
    from vectordb_similarity_search_spark.plans import REGISTRY

    for group in (bench.HEADLINE, bench.PIPELINE, bench.ANN, bench.ANALYTICS):
        unknown = [q for q in group if q not in REGISTRY]
        assert not unknown, unknown
