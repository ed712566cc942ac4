"""Query BUILD must be plan-only for the SQL families: constructing the
DataFrame runs zero Spark jobs (eager .count()/.collect() at build time
bakes literals into the plan and puts driver-side jobs on the query path —
the anti-pattern previously fixed in r_intersect_except, s_sample_stratified
and t_exact_dedup).

Exempt by design (documented in their docstrings): vector queries that
fetch the query vector (one tiny head()), ANN queries that build/load a
cached index, and the model-backed queries that fit/load a model once per
process (m_*, p_pca). Those run bounded build-once work, not per-build
scans of the data."""

from __future__ import annotations

import uuid

import pytest

from vectordb_similarity_search_spark.plans import REGISTRY

SQL_FAMILIES = ("r_", "w_", "e_", "t_")


@pytest.mark.parametrize(
    "name", [n for n in REGISTRY if n.startswith(SQL_FAMILIES)]
)
def test_build_runs_no_jobs(spark, sf_dir, name):
    sc = spark.sparkContext
    # warm: the first touch of a table pays spark.read.parquet's 1-task
    # schema-footer job (inherent to the reader, cached by load_table)
    REGISTRY[name].fn(spark, sf_dir)
    group = f"lazy-probe-{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, f"build {name}")
    try:
        REGISTRY[name].fn(spark, sf_dir)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert list(jobs) == [], f"{name} ran {len(jobs)} job(s) at plan build"
