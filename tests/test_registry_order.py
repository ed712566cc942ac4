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
    round) must sit inside the first 50 slots, and no query family may go
    driver-unverified for two consecutive rounds: each family appears in
    the CURRENT window or was green in the most recent committed
    CORRECTNESS file (round-4 relaxation — the rotation that refreshes
    r1-era rows must be allowed to displace families that just went
    all-green)."""
    import json
    import os
    import re

    window = set(DRIVER_WINDOW)
    assert len(DRIVER_WINDOW) <= 50
    rows_only = {n for n, s in REGISTRY.items() if s.oracle is None}
    assert rows_only <= window, rows_only - window

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = sorted(
        f for f in os.listdir(root) if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    )[-1]
    with open(os.path.join(root, latest)) as fh:
        recent_green = {
            n
            for n, v in json.load(fh).items()
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
        }
    covered = {n.split("_")[0] for n in window | recent_green}
    families = {n.split("_")[0] for n in REGISTRY}
    assert covered >= families, families - covered


def test_every_family_inside_the_window():
    """Stronger than the OR-check above (round-6 lesson): once this
    window's own CORRECTNESS file is deposited, the latest-green set is a
    SUBSET of the window, so a family outside the window goes
    driver-unverified two rounds running. Require every family in the
    window itself."""
    in_window = {n.split("_")[0] for n in DRIVER_WINDOW}
    families = {n.split("_")[0] for n in REGISTRY}
    assert in_window >= families, families - in_window


def test_window_matches_rotation_generator():
    """Round-6 VERDICT order #7: the committed window must equal
    scripts/rotate_window.py's output for the committed history (rounds
    strictly below WINDOW_BUILT_FOR_ROUND), so rotations are mechanical
    and can never again hand-drop a family."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "rotate_window", os.path.join(root, "scripts", "rotate_window.py")
    )
    rw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rw)

    from vectordb_similarity_search_spark import plans

    latest = rw.load_history(root, before_round=plans.WINDOW_BUILT_FOR_ROUND)
    rows_only = {n for n, s in REGISTRY.items() if s.oracle is None}
    generated = rw.compute_window(list(REGISTRY), rows_only, latest)
    assert generated == DRIVER_WINDOW
    assert set(rw.compute_tail(list(REGISTRY), generated, latest)) == set(TAIL)


def test_rotation_generator_family_guard_evicts_freshest():
    """Unit-test compute_window's guard branch on synthetic history: a
    family whose members are all freshly checked must still displace
    the freshest filler, and canaries/rows-only stay protected."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "rotate_window_guard", os.path.join(root, "scripts", "rotate_window.py")
    )
    rw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rw)

    # 6 names / 4 families, cap 4: e_ canary + stale a_q1/a_q2/c_q1
    # fill the window; the z_ family (both members fresh, rounds 8/9)
    # would be dropped without the guard. Expect: z's stalest member
    # evicts the freshest filler whose family keeps another
    # representative (a_q2), never the singleton c_q1.
    names = ["e_tumbling_hourly", "a_q1", "a_q2", "c_q1", "z_q1", "z_q2"]
    latest = {"a_q1": 1, "a_q2": 2, "c_q1": 3, "z_q1": 9, "z_q2": 8,
              "e_tumbling_hourly": 9}
    win = rw.compute_window(names, set(), latest, cap=4)
    assert win[0] == "e_tumbling_hourly"  # canary protected
    assert "z_q2" in win  # stalest z member swapped in
    assert "a_q2" not in win  # the freshest multi-rep filler evicted
    assert "c_q1" in win  # singleton-family filler NOT evicted
    assert {n.split("_")[0] for n in win} == {"e", "a", "c", "z"}

    # rows-only are protected from eviction too
    win2 = rw.compute_window(names, {"c_q1"}, latest, cap=4)
    assert "c_q1" in win2 and "z_q2" in win2
    assert {n.split("_")[0] for n in win2} == {"e", "a", "c", "z"}

    # a cap smaller than the family count is genuinely unsatisfiable
    import pytest

    with pytest.raises(SystemExit):
        rw.compute_window(names + ["x_q1"], set(), {**latest, "x_q1": 9}, cap=4)
