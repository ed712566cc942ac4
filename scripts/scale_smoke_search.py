#!/usr/bin/env python
"""Search-surface smoke at 1M x 64: filtered / range / MMR search and the
index delete lifecycle, measured where data dwarfs constants.

Checks:
- exact filtered search (predicate pushed to scan) wall + result sanity,
- filtered IVF probe vs exact filtered search: recall@10 and speedup,
- range search wall + count (shuffle-free scan),
- delete 1k ids -> probes exclude them; compact purges physically and
  retires the tombstone dir; post-compact probe wall ~= pre-delete,
- MMR rerank of top-100 candidates (distributed retrieve + one tiny
  rerank group).

    python scripts/scale_smoke_search.py   # ~3-5 min incl. index build
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
NPROBE = 16
K = 10


def timed(thunk):
    t0 = time.perf_counter()
    out = thunk()
    return out, time.perf_counter() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_similarity_search_spark.operators.ann import (
        ivf_compact,
        ivf_delete,
        ivf_fit,
        ivf_search_index,
        ivf_write_index,
    )
    from vectordb_similarity_search_spark.operators.topk import (
        filtered_knn,
        knn,
        mmr_rerank,
        range_search,
    )
    from vectordb_similarity_search_spark.session import get_spark

    spark = get_spark(
        app_name="scale-smoke-search", master="local[32]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    vecs = (
        spark.range(0, N_VECTORS, 1, 64)
        .select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 10).cast("int").alias("label"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: F.sin(F.col("id") * i + i).cast("double"),
            ).alias("embedding"),
        )
    )
    work = tempfile.mkdtemp(prefix="smoke_search_")
    corpus_path = os.path.join(work, "corpus")
    vecs.write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    qv = [float(x) for x in corpus.filter(F.col("vec_id") == 0).head()["embedding"]]

    # ---- exact filtered search (10% selective predicate, pushed to scan)
    pred = F.col("label") == 3
    filtered_knn(corpus, qv, K, predicate=pred).write.format("noop").mode("overwrite").save()  # warm
    exact_rows, t_exact = timed(
        lambda: filtered_knn(corpus, qv, K, predicate=pred).collect()
    )
    exact_ids = [r.vec_id for r in exact_rows]
    assert len(exact_ids) == K and all(r.label == 3 for r in exact_rows)
    print(f"exact filtered search ({N_VECTORS} rows, 10% filter): {t_exact:.2f} s")

    # ---- index build + filtered probe (fit ONCE: the probe must use the
    # exact centers the index was written with)
    path = os.path.join(work, "ivf")
    t0 = time.perf_counter()
    model = ivf_fit(corpus, n_cells=N_CELLS, seed=42)
    ivf_write_index(model, corpus, path)
    t_build = time.perf_counter() - t0
    print(f"index build ({N_CELLS} cells): {t_build:.1f} s")

    probe = lambda: ivf_search_index(
        spark, path, model, qv, k=K, nprobe=NPROBE, predicate=pred
    ).collect()
    probe()  # warm
    probed_rows, t_probe = timed(probe)
    recall = len(set(exact_ids) & {r.vec_id for r in probed_rows}) / K
    print(f"filtered IVF probe (nprobe={NPROBE}/{N_CELLS}): {t_probe:.2f} s, "
          f"recall@{K} vs exact filtered = {recall:.2f}, "
          f"speedup vs exact = {t_exact / t_probe:.1f}x")
    assert recall >= 0.8, f"filtered-probe recall {recall} < 0.8"

    # ---- range search (shuffle-free scan)
    range_search(corpus, qv, 0.99).write.format("noop").mode("overwrite").save()
    hits, t_range = timed(lambda: range_search(corpus, qv, 0.99).count())
    print(f"range search (cos >= 0.99): {hits} hits, {t_range:.2f} s")
    assert hits >= 1  # the query vector itself

    # ---- delete lifecycle at scale
    victims = sorted(set(exact_ids[:5]) | set(range(N_VECTORS // 2, N_VECTORS // 2 + 995)))
    _, t_del = timed(lambda: ivf_delete(spark, path, victims))
    after = ivf_search_index(spark, path, model, qv, k=K, nprobe=NPROBE, predicate=pred).collect()
    assert not set(victims) & {r.vec_id for r in after}
    _, t_probe_tomb = timed(lambda: ivf_search_index(
        spark, path, model, qv, k=K, nprobe=NPROBE, predicate=pred).collect())
    _, t_compact = timed(lambda: ivf_compact(spark, path, target_rows_per_file=200_000))
    assert not os.path.isdir(os.path.join(path, "_tombstones"))
    n_after = spark.read.parquet(path).count()
    assert n_after == N_VECTORS - len(victims), (n_after, len(victims))
    post = ivf_search_index(spark, path, model, qv, k=K, nprobe=NPROBE, predicate=pred)
    post_rows, t_post = timed(lambda: post.collect())
    assert not set(victims) & {r.vec_id for r in post_rows}
    print(f"delete {len(victims)} ids: {t_del:.2f} s; probe w/ tombstones {t_probe_tomb:.2f} s; "
          f"compact (purge+rewrite): {t_compact:.1f} s; probe after: {t_post:.2f} s")

    # ---- MMR rerank over distributed top-100
    cands = knn(corpus, qv, 100)
    mmr_rerank(cands, K).write.format("noop").mode("overwrite").save()
    out, t_mmr = timed(lambda: mmr_rerank(cands, K).collect())
    assert len(out) == K
    print(f"retrieve top-100 + MMR rerank to {K}: {t_mmr:.2f} s")

    print("ALL OK")


if __name__ == "__main__":
    main()
