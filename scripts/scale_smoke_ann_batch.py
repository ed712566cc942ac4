#!/usr/bin/env python
"""Batch-ANN serving at 1M x 64: ivf_search_index_batch (100 queries, ONE
partition-pruned scan) vs the per-query probe loop — the round-4 batch
path's reason to exist, measured where data dwarfs constants.

Checks:
- batch wall for 100 queries vs (sampled) per-query loop wall x100,
- batch results == per-query results on the sampled queries,
- one scan in the batch plan.

    python scripts/scale_smoke_ann_batch.py   # ~2-4 min incl. index build
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_VECTORS = int(os.environ.get("SCALE_VECTORS", 1_000_000))
DIM = 64
N_CELLS = 256
N_QUERIES = 100
NPROBE = 8
K = 10
SAMPLE_SINGLE = 10  # per-query loop measured on this many, extrapolated


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_similarity_search_spark.operators.ann import (
        ivf_fit,
        ivf_search_index,
        ivf_search_index_batch,
        ivf_write_index,
    )
    from vectordb_similarity_search_spark.session import get_spark

    spark = get_spark(
        app_name="scale-smoke-ann-batch", master="local[32]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    vecs = (
        spark.range(0, N_VECTORS, 1, 64)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: F.sin(F.col("id") * i + i).cast("double"),
            ).alias("embedding"),
        )
    )
    work = tempfile.mkdtemp(prefix="smoke_annb_")
    path = os.path.join(work, "ivf")

    t0 = time.perf_counter()
    model = ivf_fit(vecs, n_cells=N_CELLS, seed=42)
    ivf_write_index(model, vecs, path)
    t_build = time.perf_counter() - t0

    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in vecs.filter(F.col("vec_id") < N_QUERIES).collect()
    ]

    # warm once (codegen + page cache), then measure
    ivf_search_index_batch(
        spark, path, model, queries, k=K, nprobe=NPROBE
    ).write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    batch = ivf_search_index_batch(
        spark, path, model, queries, k=K, nprobe=NPROBE
    )
    batch_rows = batch.collect()
    t_batch = time.perf_counter() - t0

    sampled = queries[:SAMPLE_SINGLE]
    t0 = time.perf_counter()
    single = {}
    for qid, qv in sampled:
        single[qid] = {
            r.vec_id
            for r in ivf_search_index(
                spark, path, model, qv, k=K, nprobe=NPROBE
            ).collect()
        }
    t_single_sample = time.perf_counter() - t0
    t_single_extrap = t_single_sample / SAMPLE_SINGLE * N_QUERIES

    got = {}
    for r in batch_rows:
        got.setdefault(r.q_id, set()).add(r.vec_id)
    match = all(got.get(qid) == ids for qid, ids in single.items())

    ok = (
        len(batch_rows) == N_QUERIES * K
        and match
        and t_batch < t_single_extrap
    )
    print(
        {
            "vectors": N_VECTORS,
            "cells": N_CELLS,
            "queries": N_QUERIES,
            "nprobe": NPROBE,
            "build_s": round(t_build, 1),
            "batch_wall_s": round(t_batch, 2),
            "per_query_loop_extrapolated_s": round(t_single_extrap, 1),
            "speedup_vs_loop": round(t_single_extrap / t_batch, 1),
            "results_match_single": match,
            "ok": ok,
        }
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
