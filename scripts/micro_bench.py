#!/usr/bin/env python
"""Per-query micro-bench: the exact bench.py protocol (1 warm, min of 3,
noop sink, same session factory/probe-free) for a named subset — for
iterating on one query without paying the full bench wall.

Usage: python scripts/micro_bench.py <query> [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from vectordb_similarity_search_spark.plans import REGISTRY  # noqa: E402
from vectordb_similarity_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="micro_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn

        def run() -> None:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        spark.sparkContext.setJobDescription(f"micro:{name}")
        run()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
