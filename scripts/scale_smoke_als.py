#!/usr/bin/env python
"""Distributed ALS at sf0.1 scale under a vanilla SparkSession.

What it proves (the claims in ml/als.py):

- the join + grouped-solve half-steps survive the sf0.1 purchase matrix
  (~600k lineitems → ~15k users × ~20k parts) with NO driver-side
  collect of ratings or factors;
- training RMSE decreases across rounds (the solver actually fits);
- the factors are LAYOUT-INDEPENDENT: a re-run over hostile-partitioned
  ratings reproduces every user factor bit-for-bit (content-keyed init
  + counterpart-sorted normal-equation folds);
- wall time per round.

    python scripts/scale_smoke_als.py
    SMOKE_SF_DIR=/root/testdata/sf0.01 python scripts/scale_smoke_als.py
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SMOKE_SF_DIR", "/root/testdata/sf0.1")

failures: list[str] = []


def check(name: str, ok: bool, detail: str = "") -> None:
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}", flush=True)
    if not ok:
        failures.append(name)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vectordb_similarity_search_spark.ml.als import als_fit

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("smoke-als")
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(
        os.path.join(SF_DIR, "lineitem.parquet")
    ).select("l_orderkey", "l_partkey", "l_quantity")
    ratings = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
        )
        .agg(
            F.least(F.sum("l_quantity").cast("double"), F.lit(10.0)).alias(
                "rating"
            )
        )
    )
    n = ratings.count()
    n_u = ratings.select("user_id").distinct().count()
    n_i = ratings.select("item_id").distinct().count()
    print(f"ratings: {n} cells, {n_u} users x {n_i} items")

    t0 = time.perf_counter()
    uf, itf, rmse = als_fit(ratings, rank=4, reg=0.1, n_iter=3)
    wall = time.perf_counter() - t0
    print(f"als rank=4 x 3 rounds: {wall:.1f}s  rmse={['%.4f' % r for r in rmse]}")

    check("rmse decreases", rmse[-1] < rmse[0], f"{rmse[0]:.4f}->{rmse[-1]:.4f}")
    check(
        "every user solved",
        uf.count() == n_u and itf.count() == n_i,
        f"{uf.count()}/{n_u} users, {itf.count()}/{n_i} items",
    )

    # layout independence: hostile repartition, bit parity on user factors
    uf2, _, rmse2 = als_fit(
        ratings.repartition(7, "item_id"), rank=4, reg=0.1, n_iter=3
    )
    diff = (
        uf.select("u", F.col("f").alias("a"))
        .join(uf2.select("u", F.col("f").alias("b")), "u", "full")
        .filter(
            F.col("a").isNull()
            | F.col("b").isNull()
            | (F.col("a") != F.col("b"))
        )
        .count()
    )
    check("bit-identical across layouts", diff == 0, f"mismatched users={diff}")
    check("rmse trace identical", rmse == rmse2, f"{rmse} vs {rmse2}")

    print("ALL OK" if not failures else f"FAILURES: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
