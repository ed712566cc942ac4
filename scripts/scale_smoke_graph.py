#!/usr/bin/env python
"""Integer PageRank at scale under a vanilla SparkSession.

What it proves (the claims in operators/graph.py):

- the power iteration survives a multi-million-edge graph (default 2M
  edges over ~200k nodes, Zipf-ish in-degree so a few hub nodes absorb
  most mass — the realistic web-graph shape);
- total mass is conserved within the documented integer-remainder bound
  across all iterations;
- the result is LAYOUT-INDEPENDENT: a second run over the same edges
  repartitioned differently produces bit-identical rank_units for every
  node (the exact-int64 contract, not just top-k stability);
- hubs rank above the uniform baseline and the ordering is sane
  (rank correlates with weighted in-degree on sinks);
- wall time for build+iterate+collect-top-20.

    python scripts/scale_smoke_graph.py            # ~1 min
    SMOKE_EDGES=10000000 python scripts/...        # bigger run
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_EDGES = int(os.environ.get("SMOKE_EDGES", 2_000_000))

failures: list[str] = []


def check(name: str, ok: bool, detail: str = "") -> None:
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}", flush=True)
    if not ok:
        failures.append(name)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vectordb_similarity_search_spark.operators.graph import (
        RANK_SCALE,
        pagerank,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("smoke-graph")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Zipf-ish destination popularity: dst = floor(u^3 * n_nodes) piles
    # mass onto low ids; src near-uniform. Deterministic content-keyed
    # hashing (no rand()) so both runs build the SAME graph.
    n_nodes = max(N_EDGES // 10, 1000)
    ids = spark.range(N_EDGES)
    u = (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % 1_000_000) / 1_000_000.0
    edges = ids.select(
        (F.abs(F.xxhash64(F.col("id"), F.lit(2))) % n_nodes).alias("src"),
        F.floor(u * u * u * n_nodes).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))

    t0 = time.time()
    r1 = pagerank(edges, n_iter=6)
    top1 = r1.orderBy(F.col("rank_units").desc(), "node").limit(20).collect()
    wall = time.time() - t0
    stats = r1.agg(
        F.sum("rank_units").alias("s"), F.count("*").alias("n")
    ).first()
    print(f"pagerank {N_EDGES} edges / {stats['n']} nodes: {wall:.1f}s")

    check(
        "mass conserved",
        abs(stats["s"] - stats["n"] * RANK_SCALE) < 6 * 2 * stats["n"],
        f"drift={stats['s'] - stats['n'] * RANK_SCALE}",
    )
    check(
        "hubs beat uniform baseline",
        top1[0]["rank_units"] > 10 * RANK_SCALE,
        f"top rank={top1[0]['rank']}",
    )

    # layout independence: same edges, hostile repartition, bit parity
    r2 = pagerank(edges.repartition(7, "dst"), n_iter=6)
    diff = (
        r1.withColumnRenamed("rank_units", "a")
        .select("node", "a")
        .join(r2.select("node", F.col("rank_units").alias("b")), "node", "full")
        .filter(
            (F.col("a").isNull())
            | (F.col("b").isNull())
            | (F.col("a") != F.col("b"))
        )
        .count()
    )
    check("bit-identical across layouts", diff == 0, f"mismatched nodes={diff}")

    # sanity: among pure sinks, more weighted in-trade => more rank
    top_ids = [r["node"] for r in top1[:5]]
    indeg = (
        edges.groupBy("dst").count().orderBy(F.col("count").desc(), "dst")
        .limit(5).collect()
    )
    check(
        "top ranks are the top in-degree hubs",
        set(top_ids[:3]) <= {r["dst"] for r in indeg},
        f"top3={top_ids[:3]}",
    )

    print("ALL OK" if not failures else f"FAILURES: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
