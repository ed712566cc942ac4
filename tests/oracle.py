"""Local replica of the driver's Spark-vs-DuckDB comparison.

Mirrors the driver contract: run the Spark plan and the oracle SQL on the
same parquet fixtures, sort columns by name, sort rows, compare values
exactly (floats included — the queries are engineered for bit-equality via
decimal-exact aggregation or explicit rounding, see plans/catalog.py).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from vectordb_similarity_search_spark.sources.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[ns]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif isinstance(s.dtype, object.__class__) and s.dtype == object:
            # arrays/lists → tuples for sortability
            df[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(spark_df, oracle: str, sf_dir: str) -> None:
    con = duck_con(sf_dir)
    expected = _normalize(con.execute(oracle).fetchdf())
    actual = _normalize(spark_df.toPandas())
    assert list(actual.columns) == list(expected.columns), (
        f"column mismatch: spark={list(actual.columns)} duckdb={list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} duckdb={len(expected)}"
    )
    pd.testing.assert_frame_equal(actual, expected, check_exact=True, check_dtype=False)
