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
