"""Gap-fill + LOCF invariants (e_gapfill_locf; value parity vs DuckDB is
covered by tests/test_oracle_parity.py — these pin the *shape* guarantees
the resample contract makes)."""

from __future__ import annotations

from collections import defaultdict

from vectordb_similarity_search_spark.plans import REGISTRY

from .conftest import SMOKE_SF


def test_grid_is_dense_and_counts_conserved(spark):
    rows = REGISTRY["e_gapfill_locf"].fn(spark, SMOKE_SF).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    assert by_type
    from vectordb_similarity_search_spark.sources.tables import load_table

    total_events = load_table(spark, SMOKE_SF, "events").count()
    assert sum(r["n_events"] for r in rows) == total_events
    for evt, series in by_type.items():
        hs = sorted(r["hour_start"] for r in series)
        # dense: every hour between min and max present exactly once
        assert hs == list(range(hs[0], hs[-1] + 1, 3600)), evt
        # LOCF: first bucket has data by construction, so no NULL ever
        series.sort(key=lambda r: r["hour_start"])
        assert series[0]["n_events"] > 0
        assert all(r["locf_value"] is not None for r in series)
