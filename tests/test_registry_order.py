"""Pin the driver-facing registry order.

The grading driver records CORRECTNESS verdicts for the first 50 registry
entries only; these tests keep the explicit window/tail lists in
plans/__init__.py in exact sync with what is actually registered, so a new
query can't silently land outside the verification window (or a rename
silently drop a query from it).
"""

from __future__ import annotations

from vectordb_similarity_search_spark.plans import DRIVER_WINDOW, REGISTRY, TAIL


def test_window_and_tail_exactly_cover_registry():
    listed = DRIVER_WINDOW + TAIL
    assert len(listed) == len(set(listed)), "duplicate names in order lists"
    assert set(listed) == set(REGISTRY), (
        "order lists out of sync with registry: "
        f"missing={set(REGISTRY) - set(listed)} stale={set(listed) - set(REGISTRY)}"
    )


def test_registry_iterates_window_first():
    assert list(REGISTRY)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW


def test_driver_window_holds_every_unstable_query():
    """Everything rows-only (weaker check → needs its driver row every
    round) and every query family's representative must sit inside the
    first 50 slots."""
    window = set(DRIVER_WINDOW)
    assert len(DRIVER_WINDOW) <= 50
    rows_only = {n for n, s in REGISTRY.items() if s.oracle is None}
    assert rows_only <= window, rows_only - window
    families = {n.split("_")[0] for n in REGISTRY}
    assert {n.split("_")[0] for n in DRIVER_WINDOW} == families
