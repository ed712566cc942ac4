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

# Seeded-generator fixtures are sf-independent (generated at sf0.001, the
# fastest). sf-BOUND fixtures (functions of the fixture tables, classified
# by catalog.expected_oracle(..., sf_bound=True) — the single source of
# truth) are generated at sf0.01, the scale the driver's correctness gate
# runs at; the dir is derived from that registry set so the two can't
# drift.
SF_FREE_DIR = "/root/testdata/sf0.001"
SF_BOUND_DIR = "/root/testdata/sf0.01"
FIXTURE_QUERIES = [
    "m_embed_knn", "m_embed_knn_bn", "p_cohort_stats", "p_search_report",
    "p_pca_variance", "m_media_decode_stats",
    "d_minhash_lsh_pairs", "d_simhash_pairs", "t_fingerprint_pairs",
    "d_semantic_prune", "s_sample_stratified", "v_ivf_recall_curve",
    "d_dedup_keep", "v_ivf_knn", "v_lsh_knn",
    "v_ivf_knn_batch", "t_bpe_train", "v_mmr_rerank", "v_ivf_knn_filtered",
    "v_index_stats", "s_sample_weighted", "t_bpe_apply",
    "t_mixture_sample", "v_recall_matrix", "m_phash_neardup",
    "d_banding_curve", "r_pagerank", "r_als_recs",
    "v_adaptive_knn", "e_stream_audit",
]
# Round-8 VERDICT #3 shrink: r_approx_distinct and the three e_hll_*
# queries now carry exact counts + a tolerance boolean with full DuckDB
# SQL twins; m_audio_energy / m_wav_loudness / m_frame_sample /
# m_scene_detect moved to GENERATOR-TRUTH twins;
# e_stream_audit's twin now encodes the scenario contract + SQL row counts over the fixtures
# written by scripts/gen_media_ground_truth.py (raw pre-encode samples /
# frame digests / deltas — independent of every engine decode path).


def main() -> None:
    from vectordb_similarity_search_spark.plans import REGISTRY
    from vectordb_similarity_search_spark.plans.catalog import SF_BOUND_ORACLES
    from vectordb_similarity_search_spark.plans.nonsql_queries import (
        pin_ivf_centers_fixture,
    )
    from vectordb_similarity_search_spark.session import get_spark

    spark = get_spark(app_name="gen-fixtures", master="local[8]",
                      shuffle_partitions=8)
    out_dir = os.path.join(ROOT, "tests", "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    # pin the fitted k-means centers FIRST: the k-means-derived fixtures
    # (d_semantic_prune, v_ivf_recall_curve, d_dedup_keep's index reuse)
    # must be generated from the same committed centers the queries load
    print("ivf centers:", pin_ivf_centers_fixture(spark, SF_BOUND_DIR))
    for name in FIXTURE_QUERIES:
        sf_dir = SF_BOUND_DIR if name in SF_BOUND_ORACLES else SF_FREE_DIR
        pdf = REGISTRY[name].fn(spark, sf_dir).toPandas()
        path = os.path.join(out_dir, f"{name}_expected.parquet")
        pdf.to_parquet(path, index=False)
        print(f"{name}: {len(pdf)} rows ({sf_dir}) -> {path}")

    # pin the INPUT table bytes the sf-bound fixtures derive from, so a
    # future testdata regeneration fails the guard test attributably
    # instead of looking like query regressions. Pin ALL fixture tables —
    # a hand-picked subset would silently drift from what future sf-bound
    # queries actually read.
    import hashlib
    import json

    from vectordb_similarity_search_spark.sources.tables import TABLES

    fps = {}
    for table in TABLES:
        p = os.path.join(SF_BOUND_DIR, f"{table}.parquet")
        fps[table] = hashlib.md5(open(p, "rb").read()).hexdigest()
    fp_path = os.path.join(out_dir, "testdata_fingerprints.json")
    with open(fp_path, "w") as fh:
        json.dump({"sf_dir": SF_BOUND_DIR, "md5": fps}, fh, indent=1)
    print(f"testdata fingerprints -> {fp_path}")


if __name__ == "__main__":
    main()
