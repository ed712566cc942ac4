#!/usr/bin/env python
"""Inverted-index scale smoke: build the materialized text index over a
synthetic corpus (default 500k docs, ~60 tokens each, 5000-word vocab)
and compare BM25 serving from the index against the full-corpus scan
path.

Asserts (not eyeballs):
- the indexed top-10 is BIT-IDENTICAL to the scan path's;
- the probe's pruned scan reads only the query terms' buckets
  (PartitionFilters present in the plan);
- steady-state probe wall beats the scan path (the point of an index:
  the scan re-tokenizes the corpus per query, the probe reads
  |terms|/num_buckets of a pre-tokenized store).

Usage: python scripts/scale_smoke_invindex.py [n_docs]
Honors SCALE_DOCS.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from vectordb_similarity_search_spark.operators.bm25 import bm25_topk  # noqa: E402
from vectordb_similarity_search_spark.operators.invindex import (  # noqa: E402
    bm25_topk_indexed,
    text_index_write,
)
from vectordb_similarity_search_spark.session import get_spark  # noqa: E402

sys.path.insert(0, os.path.join(ROOT, "scripts"))
from scale_smoke_text import gen_docs  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("SCALE_DOCS", "500000")
    )
    spark = get_spark(app_name="smoke-invindex")
    docs = gen_docs(spark, n, dup_rate=0.5).persist()
    docs.count()

    # terms that exist by construction (w%05d vocab)
    terms = ["w00042", "w01337", "w02718"]
    path = tempfile.mkdtemp(prefix="smoke_tidx_") + "/index"

    t0 = time.time()
    text_index_write(docs, path, num_buckets=64)
    build_s = time.time() - t0
    print(f"index build over {n:,} docs: {build_s:.1f}s", flush=True)

    # warm both paths once (JIT/page cache), then measure steady state
    scan_q = lambda: bm25_topk(docs, terms, k=10).collect()  # noqa: E731
    idx_q = lambda: bm25_topk_indexed(spark, path, terms, k=10).collect()  # noqa: E731
    scan_res = scan_q()
    idx_res = idx_q()
    assert [(r.doc_id, r.bm25) for r in scan_res] == [
        (r.doc_id, r.bm25) for r in idx_res
    ], "indexed top-10 diverged from scan path"
    print("  top-10 bit-identical OK", flush=True)

    from tests.conftest import plan_of

    plan = plan_of(bm25_topk_indexed(spark, path, terms, k=10))
    part = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("bucket" in ln for ln in part), "probe not partition-pruned"
    print("  probe partition-pruned OK", flush=True)

    t0 = time.time()
    scan_q()
    scan_s = time.time() - t0
    t0 = time.time()
    idx_q()
    idx_s = time.time() - t0
    print(
        f"  scan-path BM25 {scan_s:.2f}s vs indexed probe {idx_s:.2f}s "
        f"({scan_s / idx_s:.1f}x)",
        flush=True,
    )
    assert idx_s < scan_s, (
        f"indexed probe ({idx_s:.2f}s) slower than corpus scan "
        f"({scan_s:.2f}s) — the index is not earning its keep"
    )

    # --- ingest path: append 5% NEW docs, compare vs a full rebuild ----
    from vectordb_similarity_search_spark.operators.invindex import (
        text_index_append,
    )

    m = max(n // 20, 1000)
    batch = (
        gen_docs(spark, m, dup_rate=0.5)
        .select((F.col("doc_id") + n).alias("doc_id"), "text")
        .persist()
    )
    batch.count()
    t0 = time.time()
    appended = text_index_append(batch, path)
    append_s = time.time() - t0
    assert appended == m
    union = docs.unionByName(batch).persist()
    union.count()
    full2 = tempfile.mkdtemp(prefix="smoke_tidx_full_") + "/index"
    t0 = time.time()
    text_index_write(union, full2, num_buckets=64)
    rebuild_s = time.time() - t0
    a = [(r.doc_id, r.bm25)
         for r in bm25_topk_indexed(spark, path, terms, k=10).collect()]
    b = [(r.doc_id, r.bm25)
         for r in bm25_topk_indexed(spark, full2, terms, k=10).collect()]
    assert a == b, "appended store diverged from full rebuild"
    print(
        f"  append {m:,} docs {append_s:.1f}s vs rebuild over {n + m:,} "
        f"docs {rebuild_s:.1f}s ({rebuild_s / append_s:.1f}x); probe "
        "bit-identical to rebuild OK",
        flush=True,
    )
    assert append_s < rebuild_s, (
        f"append ({append_s:.1f}s) not cheaper than rebuild "
        f"({rebuild_s:.1f}s) — the ingest path is not earning its keep"
    )
    batch.unpersist()
    union.unpersist()
    docs.unpersist()
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    shutil.rmtree(os.path.dirname(full2), ignore_errors=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
