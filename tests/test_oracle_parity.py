"""Every catalog query with an oracle twin must match DuckDB exactly —
the local replica of the driver's CORRECTNESS gate, run at sf0.001 for
speed (the driver runs sf0.01; run with ORACLE_SF=1 env to do that here).
"""

from __future__ import annotations

import os

import pytest

from vectordb_similarity_search_spark.plans import REGISTRY
from vectordb_similarity_search_spark.plans.catalog import SF_BOUND_ORACLES

from .conftest import ORACLE_SF, SMOKE_SF
from .oracle import compare

SF = ORACLE_SF if os.environ.get("ORACLE_SF") else SMOKE_SF

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    spec = REGISTRY[name]
    # sf-bound fixture oracles (expected-output parquet generated from the
    # sf0.01 tables) are only meaningful at the driver's correctness scale;
    # pin their input there regardless of the smoke-sf default.
    sf = ORACLE_SF if name in SF_BOUND_ORACLES else SF
    compare(spec.fn(spark, sf), spec.oracle, sf)


def test_every_query_has_an_oracle():
    """As of round 3 every registry query carries a full rows+schema+hash
    oracle (SQL twin or expected-parquet). Adding a rows-only query again
    is a deliberate decision — update this pin and document why."""
    assert ROWS_ONLY_QUERIES == []


def test_sf_bound_fixture_inputs_unchanged():
    """The sf-bound expected-parquet fixtures are functions of the sf0.01
    table CONTENTS. If the driver ever regenerates testdata with different
    bytes, those fixtures are stale — this test fails first with an
    attributable message instead of letting the oracle comparisons fail
    as if the queries regressed. Fix: rerun scripts/gen_expected_fixtures.py
    and commit the refreshed fixtures + fingerprints."""
    import hashlib
    import json

    fp = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures",
        "testdata_fingerprints.json",
    )
    pinned = json.load(open(fp))
    # the pins must cover the directory the parity tests actually read
    assert pinned["sf_dir"] == ORACLE_SF, (
        f"fingerprints pinned for {pinned['sf_dir']} but parity runs at "
        f"{ORACLE_SF} — regenerate via scripts/gen_expected_fixtures.py"
    )
    for table, want in pinned["md5"].items():
        path = os.path.join(pinned["sf_dir"], f"{table}.parquet")
        assert os.path.exists(path), (
            f"{path} missing/moved since the sf-bound fixtures were "
            "generated — regenerate via scripts/gen_expected_fixtures.py"
        )
        got = hashlib.md5(open(path, "rb").read()).hexdigest()
        assert got == want, (
            f"{path} changed since the sf-bound fixtures were generated — "
            "regenerate via scripts/gen_expected_fixtures.py"
        )
