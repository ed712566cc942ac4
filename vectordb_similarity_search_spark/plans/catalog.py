"""Query registry: name → (Spark plan builder, DuckDB oracle SQL).

Contract (driver, see repo-root ``__spark_entry__.py``): each Spark builder
takes ``(spark, sf_dir)`` and returns a DataFrame; the oracle SQL runs in
DuckDB over pre-registered views of the same parquet tables.  Column names
are aliased identically on both sides (the driver sorts columns by name and
hashes values).

Float discipline (so value-hashes match bit-for-bit):
- money/quantity aggregates go through DECIMAL (exact) and are cast to
  double at the end — identical in Spark and DuckDB;
- intrinsically-float results (cosine scores, variances) are computed in
  double on both sides and ``(round(x, 6) + 0)``-ed in the output.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_package_on_executors
from ..sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records a weaker rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable:
    """Decorator registering a query builder under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver calls queries with its own session from an arbitrary
            # cwd; ship the package so worker-side closure unpickling can
            # import it (see session.ensure_package_on_executors).
            ensure_package_on_executors(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(name, wrapped, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand fixture-table scan."""
    return load_table(spark, sf_dir, name)
