#!/usr/bin/env python
"""Regenerate the expected-output parquet fixtures under tests/fixtures/.

These back the DuckDB oracles of queries whose results are deterministic
but not SQL-expressible (learned-embedding search: seeded weights + seeded
synthetic corpus → stable output, independent of sf_dir). Rerun after any
intentional change to the model, generator, or query, then eyeball the
diff before committing:

    python scripts/gen_expected_fixtures.py
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# name -> sf_dir the fixture is generated at. Seeded-generator queries are
# sf-independent (any sf works; sf0.001 is fastest). Queries whose output
# is a function of the fixture TABLES are sf-BOUND and must be generated
# at sf0.01 — the scale the driver's correctness gate runs at (their
# registry entries carry sf_bound=True via catalog.expected_oracle).
FIXTURE_QUERIES = {
    "m_embed_knn": "/root/testdata/sf0.001",
    "m_embed_knn_bn": "/root/testdata/sf0.001",
    "p_cohort_stats": "/root/testdata/sf0.001",
    "p_search_report": "/root/testdata/sf0.001",
    "p_pca_variance": "/root/testdata/sf0.001",
    "m_media_decode_stats": "/root/testdata/sf0.001",
    "d_minhash_lsh_pairs": "/root/testdata/sf0.01",
    "d_simhash_pairs": "/root/testdata/sf0.01",
    "t_fingerprint_pairs": "/root/testdata/sf0.01",
    "d_semantic_prune": "/root/testdata/sf0.01",
    "s_sample_stratified": "/root/testdata/sf0.01",
    "v_ivf_recall_curve": "/root/testdata/sf0.01",
    "d_dedup_keep": "/root/testdata/sf0.01",
}


def main() -> None:
    from vectordb_similarity_search_spark.plans import REGISTRY
    from vectordb_similarity_search_spark.session import get_spark

    spark = get_spark(app_name="gen-fixtures", master="local[8]",
                      shuffle_partitions=8)
    out_dir = os.path.join(ROOT, "tests", "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    for name, sf_dir in FIXTURE_QUERIES.items():
        pdf = REGISTRY[name].fn(spark, sf_dir).toPandas()
        path = os.path.join(out_dir, f"{name}_expected.parquet")
        pdf.to_parquet(path, index=False)
        print(f"{name}: {len(pdf)} rows ({sf_dir}) -> {path}")


if __name__ == "__main__":
    main()
