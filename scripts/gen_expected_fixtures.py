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

FIXTURE_QUERIES = [
    "m_embed_knn", "m_embed_knn_bn", "p_cohort_stats", "p_search_report",
    "p_pca_variance", "m_media_decode_stats",
]


def main() -> None:
    from vectordb_similarity_search_spark.plans import REGISTRY
    from vectordb_similarity_search_spark.session import get_spark

    spark = get_spark(app_name="gen-fixtures", master="local[8]",
                      shuffle_partitions=8)
    out_dir = os.path.join(ROOT, "tests", "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    for name in FIXTURE_QUERIES:
        pdf = REGISTRY[name].fn(spark, "/root/testdata/sf0.001").toPandas()
        path = os.path.join(out_dir, f"{name}_expected.parquet")
        pdf.to_parquet(path, index=False)
        print(f"{name}: {len(pdf)} rows -> {path}")


if __name__ == "__main__":
    main()
