"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the query catalog in
``vectordb_similarity_search_spark.plans`` — one registered entry per
implemented operator from SURVEY.md §2, each with a DuckDB oracle twin
where the semantics are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Self-locate: the driver may load this file by path from any cwd, so the
# package directory must be importable regardless.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from vectordb_similarity_search_spark.plans import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: top-10 cosine neighbours of a query vector with label
    metadata — the reference's E2 search path (SURVEY.md §3) on sf0.001."""
    return REGISTRY["v_knn_cosine"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; omitted entries get a rows-only check."""
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
