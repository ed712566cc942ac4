#!/usr/bin/env python
"""Exact mutual k-NN graph at scale under a vanilla-ish SparkSession.

What it proves (the claims in operators/graph.knn_graph):

- the block-grid local-top-k survives a 100k x 32-dim corpus (10^10
  scored pairs screened through BLAS slabs; candidate shuffle stays at
  O(N.n_blocks.k) rows, never N^2);
- the graph is COMPLETE and EXACT: every non-zero source emits exactly
  k ranks 1..k, and a 50-source sample matches the brute-force
  similarity_join top-k bit-for-bit (score round-6 AND rank);
- the result is GRID- and LAYOUT-INDEPENDENT: a 20k subset re-run with
  a different n_blocks and a hostile repartition produces the identical
  edge set (the 1e-9 ulp slack at the local cut never loses a winner);
- the v_knn_graph mutuality fold (groupBy on the unordered key) agrees
  with the naive self-join definition on the subset;
- wall time for the full graph build + edge count.

    python scripts/scale_smoke_knngraph.py        # ~2 min
    SMOKE_VECTORS=400000 python scripts/...       # bigger run
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_VECTORS = int(os.environ.get("SMOKE_VECTORS", 100_000))
DIM = 32
K = 10
N_BLOCKS = 16  # block ~ N/16 rows; slab = (N/16)^2 * 8B per cell task

failures: list[str] = []


def check(name: str, ok: bool, detail: str = "") -> None:
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}", flush=True)
    if not ok:
        failures.append(name)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vectordb_similarity_search_spark.operators.graph import knn_graph
    from vectordb_similarity_search_spark.operators.topk import (
        similarity_join,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("smoke-knngraph")
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    vecs = spark.range(0, N_VECTORS, 1, 32).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: F.sin(F.col("id") * i + i).cast("double"),
        ).alias("embedding"),
    )

    t0 = time.perf_counter()
    g = knn_graph(vecs, k=K, n_blocks=N_BLOCKS)
    n_edges = g.count()
    wall = time.perf_counter() - t0
    print(
        f"knn_graph {N_VECTORS} vecs x {DIM}d, k={K}, "
        f"n_blocks={N_BLOCKS}: {n_edges} edges in {wall:.1f}s"
    )
    check("edge count = N*k", n_edges == N_VECTORS * K, f"{n_edges}")

    # completeness: every src has ranks exactly 1..k
    badrank = (
        g.groupBy("src")
        .agg(
            F.count("*").alias("n"),
            F.min("rank").alias("lo"),
            F.max("rank").alias("hi"),
        )
        .filter(
            (F.col("n") != K) | (F.col("lo") != 1) | (F.col("hi") != K)
        )
        .count()
    )
    check("every src has ranks 1..k", badrank == 0, f"bad srcs={badrank}")

    # exactness on a 50-source sample vs the broadcast similarity_join
    sample = vecs.filter(
        F.col("vec_id") % max(1, N_VECTORS // 50) == 0
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = similarity_join(
        sample,
        vecs,
        k=K,
        pair_filter=F.col("vec_id") != F.col("query_id"),
    ).select(
        F.col("query_id").alias("src"),
        F.col("vec_id").alias("dst"),
        F.round("score", 6).alias("c"),
        F.col("rank").cast("int").alias("rank"),
    )
    gs = g.join(
        sample.select(F.col("query_id").alias("src")), "src"
    ).select("src", "dst", F.round("cosine", 6).alias("c"), "rank")
    mism = gs.exceptAll(exact).count() + exact.exceptAll(gs).count()
    check("sampled sources match brute force", mism == 0, f"diff rows={mism}")

    # grid/layout independence on a 20k subset
    sub = vecs.filter(F.col("vec_id") < 20_000)
    a = knn_graph(sub, k=5, n_blocks=N_BLOCKS)
    b = knn_graph(sub.repartition(7), k=5, n_blocks=5)
    sel = lambda d: d.select(  # noqa: E731
        "src", "dst", F.round("cosine", 6).alias("c"), "rank"
    )
    diff = (
        sel(a).exceptAll(sel(b)).count()
        + sel(b).exceptAll(sel(a)).count()
    )
    check("grid/layout independent (20k subset)", diff == 0, f"diff={diff}")

    # mutuality fold == naive self-join definition (subset)
    folded = (
        a.select(
            F.least("src", "dst").alias("ia"),
            F.greatest("src", "dst").alias("ib"),
        )
        .groupBy("ia", "ib")
        .count()
        .filter("count = 2")
        .count()
    )
    e1 = a.select("src", "dst")
    e2 = a.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    naive = e1.intersect(e2).filter(F.col("src") < F.col("dst")).count()
    check("mutual fold == self-join", folded == naive, f"{folded} vs {naive}")

    print("ALL OK" if not failures else f"FAILURES: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
