#!/usr/bin/env python
"""IVF drift-maintenance smoke (round-5 VERDICT #7): a drifted append
degrades cell balance and fixed-nprobe probe cost; ivf_maintain detects
the imbalance (one metadata-column count job), re-clusters, and restores
both at preserved recall.

Scenario at 120k base + 600k drift, 32-dim:
- base corpus: 8 well-separated blobs indexed by an EXPLICIT 8-centroid
  model (one centroid per blob -> perfectly balanced by construction;
  k-means init nondeterminism kept out of the gate);
- drifted append: 5x the base mass in a broad region aligned with ONE
  spike direction (margin to its centroid >> both noise and the other
  centroids), so the nearest frozen cell absorbs ALL of it;
- measured BEFORE -> AFTER maintain:
  * max_cell_ratio (hottest cell vs ideal even share),
  * probe cost: rows a fixed-nprobe probe of the drift region scans,
  * recall@10 vs exact brute-force for drift-region queries.

    python scripts/scale_smoke_ivf_drift.py    # ~2-4 min
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_BASE = int(os.environ.get("SCALE_VECTORS", 120_000))
N_DRIFT = N_BASE * 5
DIM = 32
N_CELLS = 8
NPROBE = 2
K = 10
REBALANCE_RATIO = 3.0


def timed(thunk):
    t0 = time.perf_counter()
    out = thunk()
    return out, time.perf_counter() - t0


def recall_at_k(spark, path, model, corpus, queries, k, nprobe) -> float:
    """Mean recall@k of fixed-nprobe index probes vs exact brute force
    (ONE pruned batch probe; the exact truth loops per query — fine for
    the 8 smoke queries)."""
    from vectordb_similarity_search_spark.operators.ann import (
        ivf_search_index_batch,
    )
    from vectordb_similarity_search_spark.operators.topk import knn

    approx = ivf_search_index_batch(
        spark, path, model, queries, k=k, nprobe=nprobe
    ).collect()
    by_q_a: dict = {}
    for r in approx:
        by_q_a.setdefault(r.q_id, set()).add(r.vec_id)
    recalls = []
    for q_id, qv in queries:
        exact_ids = {r.vec_id for r in knn(corpus, qv, k).collect()}
        recalls.append(len(by_q_a.get(q_id, set()) & exact_ids) / k)
    return sum(recalls) / len(recalls)


def probed_rows(model, qv, nprobe, counts) -> int:
    """Rows a fixed-nprobe probe must scan = sum of probed cells' counts."""
    return sum(counts.get(c, 0) for c in model.probe_cells(qv, nprobe))


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_similarity_search_spark.operators import ann
    from vectordb_similarity_search_spark.session import get_spark

    spark = get_spark(
        app_name="scale-smoke-ivf-drift", master="local[32]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    # base mixture: 8 blobs spiked on dims 1..8 (deterministic sin noise)
    base = (
        spark.range(0, N_BASE, 1, 64)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: (
                    F.when(i == (F.col("id") % 8) + 1, F.lit(10.0))
                    .otherwise(F.lit(0.0))
                    + F.sin(F.col("id") * i + i) * 0.5
                ).cast("double"),
            ).alias("embedding"),
        )
    )
    work = tempfile.mkdtemp(prefix="smoke_ivf_drift_")
    corpus_path = os.path.join(work, "corpus")
    base.write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    # explicit centroids at the 8 blob spikes: balance 1.0 by construction
    centers = np.zeros((N_CELLS, DIM))
    for j in range(N_CELLS):
        centers[j, j] = 10.0
    model = ann.IvfModel(centers, "embedding")
    t_fit = 0.0
    path = os.path.join(work, "idx")
    _, t_write = timed(lambda: ann.ivf_write_index(model, corpus, path))
    bal0 = ann.ivf_cell_balance(spark, path, model)
    print(
        f"build {N_BASE}x{DIM} into {N_CELLS} cells: fit {t_fit:.1f} s, "
        f"write {t_write:.1f} s, max_cell_ratio {bal0['max_cell_ratio']:.2f}"
    )
    assert bal0["max_cell_ratio"] < REBALANCE_RATIO, bal0

    # drifted append, 5x the base mass, shifted +30 on dim 1 (a region no
    # frozen centroid covers) with 4 strong sub-blobs on dims 9..12 (a new
    # domain has internal structure). Every drift point's nearest FROZEN
    # centroid is cell 0's (dim-1 margin 400 vs 900+ for the rest, >> the
    # noise), so one cell absorbs all of it — while the refit can spend
    # centroids on the sub-blobs
    drift = (
        spark.range(N_BASE, N_BASE + N_DRIFT, 1, 64)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: (
                    F.when(i == 1, F.lit(30.0))
                    .when(i == (F.col("id") % 4) + 9, F.lit(10.0))
                    .otherwise(F.lit(0.0))
                    + F.sin(F.col("id") * i) * 0.5
                ).cast("double"),
            ).alias("embedding"),
        )
    )
    drift_path = os.path.join(work, "drift")
    drift.write.parquet(drift_path)
    drift = spark.read.parquet(drift_path)
    _, t_append = timed(lambda: ann.ivf_append(model, drift, path))
    bal1 = ann.ivf_cell_balance(spark, path, model)
    print(
        f"drift append {N_DRIFT}: {t_append:.1f} s, max_cell_ratio "
        f"{bal1['max_cell_ratio']:.2f} (degraded)"
    )
    assert bal1["max_cell_ratio"] > REBALANCE_RATIO, bal1

    # drift-region queries: fixed-nprobe recall + probe cost BEFORE.
    # Exact truth reads the STABLE corpus+drift dirs, never the index —
    # a plan over the index would pin a file listing that the maintain
    # snapshot swap retires
    full = corpus.unionByName(drift)
    qids = [N_BASE + 997 * i for i in range(8)]
    qrows = {r.vec_id: [float(v) for v in r.embedding]
             for r in full.filter(F.col("vec_id").isin(qids)).collect()}
    queries = [(i, qrows[q]) for i, q in enumerate(qids)]
    rec1 = recall_at_k(spark, path, model, full, queries, K, NPROBE)
    cost1 = max(
        probed_rows(model, qv, NPROBE, bal1["counts"]) for _, qv in queries
    )
    print(f"BEFORE maintain: recall@{K} {rec1:.3f}, worst probe cost "
          f"{cost1} rows at nprobe={NPROBE}")

    (new_model, report), t_maint = timed(
        lambda: ann.ivf_maintain(
            spark, path, model, rebalance_ratio=REBALANCE_RATIO
        )
    )
    assert report["action"] == "recluster", report
    bal2 = ann.ivf_cell_balance(spark, path, new_model)
    rec2 = recall_at_k(spark, path, new_model, full, queries, K, NPROBE)
    cost2 = max(
        probed_rows(new_model, qv, NPROBE, bal2["counts"])
        for _, qv in queries
    )
    print(
        f"maintain (recluster): {t_maint:.1f} s, max_cell_ratio "
        f"{bal2['max_cell_ratio']:.2f} (restored); AFTER: recall@{K} "
        f"{rec2:.3f}, worst probe cost {cost2} rows"
    )
    assert bal2["max_cell_ratio"] < REBALANCE_RATIO, bal2
    assert rec2 >= 0.9, rec2  # recall preserved while probing fewer rows
    assert cost2 < cost1, (cost2, cost1)
    assert bal2["total_rows"] == N_BASE + N_DRIFT

    print("ALL OK")


if __name__ == "__main__":
    main()
