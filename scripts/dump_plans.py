#!/usr/bin/env python
"""Dump .explain("formatted") for named registry queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> <suffix> [query ...]
  tag     e.g. r09  -> writes plans/r09/<query>_<suffix>.txt
  suffix  "before" or "after"
  query   names; default = bench groups (headline+pipeline+ann+analytics).
"""
from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from vectordb_similarity_search_spark.plans import REGISTRY  # noqa: E402
from vectordb_similarity_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = bench.HEADLINE + bench.PIPELINE + bench.ANN + bench.ANALYTICS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(ROOT, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
