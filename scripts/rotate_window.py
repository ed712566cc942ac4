#!/usr/bin/env python
"""Derive the driver verification window from CORRECTNESS history.

Round-6 VERDICT order #7: the hand-ordered ``DRIVER_WINDOW`` list in
``plans/__init__.py`` went red against the freshly deposited
CORRECTNESS_r06.json because the hand rotation dropped five whole query
families from the 50-slot window.  This script makes the rotation
mechanical so that failure mode cannot recur:

Policy (in priority order, deterministic):

1. **Canaries first** (``CANARIES``): unchanged environment probes that
   must re-run every round (e.g. ``e_tumbling_hourly`` — the timestamp
   normalization seam the round-3 NANOS→NTZ Spark-build break hit).
2. **Rows-only queries** (no DuckDB oracle): the driver's weaker check is
   their ONLY check, so they hold a slot every round (currently none —
   all 216 registry queries have oracles).
3. **Stalest-first fill**: everything else sorted by (latest driver-checked
   round, name); never-checked queries sort before everything (round -1).
4. **Family guard**: every query family (name prefix before the first
   ``_``) must appear IN the window.  Not "window or latest green": once
   this window's own CORRECTNESS file lands, the latest-green set is a
   subset of the window, so any family outside the window goes
   driver-unverified two rounds running — exactly the round-6 red gate.
   Missing families displace the FRESHEST non-protected filler.

History cutoff: the window is built from CORRECTNESS files of rounds
STRICTLY BELOW ``plans.WINDOW_BUILT_FOR_ROUND`` (the round whose driver
run the window is for).  That keeps ``tests/test_registry_order.py``'s
committed-list == generated-list check green when the new round's file is
deposited; the next round's builder bumps the marker and re-runs
``--write``.

Usage:
    python scripts/rotate_window.py            # print the window
    python scripts/rotate_window.py --check    # exit 1 on drift
    python scripts/rotate_window.py --write    # rewrite plans/__init__.py
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PLANS_INIT = os.path.join(
    ROOT, "vectordb_similarity_search_spark", "plans", "__init__.py"
)
CAP = 50  # the grading driver records verdicts for the first 50 entries
CANARIES = ["e_tumbling_hourly"]
BEGIN = "# --- BEGIN GENERATED WINDOW (scripts/rotate_window.py --write) ---"
END = "# --- END GENERATED WINDOW ---"


def load_history(root: str, *, before_round: int) -> dict[str, int]:
    """name -> latest round with ANY driver row, rounds < before_round."""
    latest: dict[str, int] = {}
    for f in os.listdir(root):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f)
        if not m or int(m.group(1)) >= before_round:
            continue
        rnd = int(m.group(1))
        with open(os.path.join(root, f)) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, -1), rnd)
    return latest


def compute_window(
    names: list[str],
    rows_only: set[str],
    latest: dict[str, int],
    cap: int = CAP,
) -> list[str]:
    def stale_key(n: str) -> tuple[int, str]:
        return (latest.get(n, -1), n)

    window = [c for c in CANARIES if c in names]
    window += sorted((rows_only - set(window)) & set(names), key=stale_key)
    protected = len(window)
    if protected > cap:
        raise SystemExit(
            f"{protected} canary/rows-only queries exceed the {cap}-slot cap"
        )
    fill = sorted((n for n in names if n not in window), key=stale_key)
    window += fill[: cap - protected]

    # Family guard: swap missing families in over the freshest fillers.
    fam = lambda n: n.split("_")[0]  # noqa: E731
    for family in sorted({fam(n) for n in names}):
        if any(fam(n) == family for n in window):
            continue
        candidates = sorted((n for n in names if fam(n) == family), key=stale_key)
        # evict the freshest non-protected member whose family keeps
        # another representative in the window
        for i in range(len(window) - 1, protected - 1, -1):
            if sum(1 for n in window if fam(n) == fam(window[i])) > 1:
                window[i] = candidates[0]
                break
        else:
            raise SystemExit(f"cannot fit family {family!r} into the window")
    return window


def compute_tail(names: list[str], window: list[str], latest: dict[str, int]):
    """Everything else, freshest-checked first (never-checked sort last —
    they are next round's window candidates and easiest to eyeball)."""
    rest = [n for n in names if n not in window]
    return sorted(rest, key=lambda n: (-latest.get(n, -1), n))


def render(window: list[str], tail: list[str], built_for: int, latest) -> str:
    def annotate(names: list[str]) -> str:
        out = []
        for n in names:
            rnd = latest.get(n, None)
            tag = f"  # last driver row r{rnd}" if rnd is not None else (
                "  # never driver-checked"
            )
            out.append(f'    "{n}",{tag}')
        return "\n".join(out)

    return f"""{BEGIN}
# Regenerate with: python scripts/rotate_window.py --write
# (bump WINDOW_BUILT_FOR_ROUND first; the generator reads CORRECTNESS
# files of rounds strictly below it). tests/test_registry_order.py pins
# committed == generated for this marker.
WINDOW_BUILT_FOR_ROUND = {built_for}

DRIVER_WINDOW = [
{annotate(window)}
]

# Past the driver's 50-slot cap - every query here is re-verified on every
# test run by the local oracle replica (tests/test_oracle_parity.py).
TAIL = [
{annotate(tail)}
]
{END}"""


def main() -> int:
    from vectordb_similarity_search_spark import plans

    built_for = plans.WINDOW_BUILT_FOR_ROUND
    names = list(plans.REGISTRY)
    rows_only = {n for n, s in plans.REGISTRY.items() if s.oracle is None}
    latest = load_history(ROOT, before_round=built_for)
    window = compute_window(names, rows_only, latest)
    tail = compute_tail(names, window, latest)

    if "--check" in sys.argv:
        ok = window == plans.DRIVER_WINDOW and set(tail) == set(plans.TAIL)
        print("window parity:", "OK" if ok else "DRIFT")
        if not ok:
            committed = plans.DRIVER_WINDOW
            print("only-in-generated:", [n for n in window if n not in committed])
            print("only-in-committed:", [n for n in committed if n not in window])
        return 0 if ok else 1

    if "--write" in sys.argv:
        with open(PLANS_INIT) as fh:
            src = fh.read()
        block = render(window, tail, built_for, latest)
        pre, _, rest = src.partition(BEGIN)
        if not rest:
            raise SystemExit(f"BEGIN marker not found in {PLANS_INIT}")
        mid, sep, post = rest.partition(END)
        if not sep:
            # a missing END would make this write silently truncate the
            # module tail (_reorder, __all__) — refuse instead
            raise SystemExit(f"END marker not found in {PLANS_INIT}")
        with open(PLANS_INIT, "w") as fh:
            fh.write(pre + block + post)
        print(f"wrote {len(window)}-slot window + {len(tail)}-entry tail")
        return 0

    print(json.dumps({"built_for_round": built_for, "window": window}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
