#!/usr/bin/env python
"""Exact set-similarity join (PPJoin) scale smoke: run
operators/dedup.ppjoin_pairs on the synthetic injected-near-dup corpus at
20-100x the sf0.1 fixture and prove EXACTNESS at scale — the found pairs
must be exactly the injected ones (word-3-gram Jaccard of an injected pair
is ~0.90 >= 0.8; a random vocabulary pair is ~0), with the prefix filter
doing the pruning that makes the exact join feasible.

Usage: python scripts/scale_smoke_ppjoin.py [n_docs] [dup_rate]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from scale_smoke_text import gen_docs, injected_pairs  # noqa: E402
from vectordb_similarity_search_spark.functions.text import tokens  # noqa: E402
from vectordb_similarity_search_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    ppjoin_pairs,
)
from vectordb_similarity_search_spark.session import get_spark  # noqa: E402


def word_ngram_sets(docs, n: int = 3):
    from vectordb_similarity_search_spark.functions.text import word_ngrams

    return docs.select(
        "doc_id", word_ngrams(tokens("text"), n).alias("sh")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dup_rate = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    docs = gen_docs(spark, n, dup_rate).persist()
    n_docs = docs.count()
    # injected truth comes from the generator's own exported rule —
    # never re-derived inline (round-4 ADVICE)
    want = injected_pairs(n, dup_rate)
    print(f"corpus: {n_docs} docs, {len(want)} injected near-dup pairs", flush=True)

    sets = word_ngram_sets(docs).persist()
    sets.count()

    t0 = time.time()
    got_df = ppjoin_pairs(sets, "doc_id", "sh", 0.8)
    got = {(r.id_a, r.id_b) for r in got_df.collect()}
    wall_exact = time.time() - t0
    print(
        f"ppjoin_pairs(J>=0.8 word-3gram, EXACT): {len(got)} pairs "
        f"{wall_exact:.1f}s",
        flush=True,
    )
    assert got == want, (
        f"exactness violated: missing={sorted(want - got)[:5]} "
        f"extra={sorted(got - want)[:5]}"
    )

    t0 = time.time()
    mh = minhash_lsh_pairs(
        docs, threshold=0.8, bands=16, n_hashes=64, shingle_mode="word",
        shingle_n=3,
    )
    n_mh = mh.count()
    wall_mh = time.time() - t0
    print(
        f"minhash_lsh_pairs(same corpus/threshold, approximate): {n_mh} "
        f"pairs {wall_mh:.1f}s — exact join costs "
        f"{wall_exact / max(wall_mh, 1e-9):.2f}x the sketch",
        flush=True,
    )
    docs.unpersist()
    sets.unpersist()
    print("ppjoin smoke OK", flush=True)


if __name__ == "__main__":
    main()
