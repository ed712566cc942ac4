#!/usr/bin/env python
"""Decontamination scale smoke: run the t_decontaminate plan
(plans/text_queries.py::contamination_report) on a synthetic corpus
~100x the sf0.1 fixture, with a known injected contamination rate, and
check the report finds EXACTLY the injected docs.

Usage: python scripts/scale_smoke_decontam.py [n_docs] [contam_rate]

Corpus: 100 sources; source src000 is the held-out eval slice. Every
``1/contam_rate``-th non-eval doc copies an eval doc's text (full 5-gram
overlap); all other docs draw from a 5000-word vocabulary where random
5-gram collisions are effectively impossible — so the expected report is
exact, not statistical.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from vectordb_similarity_search_spark.plans.text_queries import (  # noqa: E402
    contamination_report,
)
from vectordb_similarity_search_spark.session import get_spark  # noqa: E402

VOCAB_SIZE = 5000
N_SOURCES = 100


def gen_docs(spark, n: int, contam_rate: float):
    """n docs over N_SOURCES sources (source = id % N_SOURCES). Docs with
    ``id % stride == 1`` (never source src000 since stride % N_SOURCES
    != 1 is required — asserted) copy the text of eval doc
    ``(id // N_SOURCES) * N_SOURCES`` (source src000)."""
    stride = int(1 / contam_rate)
    assert stride % N_SOURCES != 1, "stride would alias the eval source"
    contaminated = (F.col("id") % stride == 1) & (F.col("id") % N_SOURCES != 0)
    src_id = F.when(
        contaminated, (F.col("id") / N_SOURCES).cast("long") * N_SOURCES
    ).otherwise(F.col("id"))
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(60)),
        lambda i: F.format_string(
            "w%05d", F.pmod(F.xxhash64(src_id, i), F.lit(VOCAB_SIZE))
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.format_string("src%03d", F.col("id") % N_SOURCES).alias("source"),
        F.array_join(toks, " ").alias("text"),
        contaminated.alias("is_contaminated"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    rate = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs = gen_docs(spark, n, rate).persist()
    expected = docs.filter("is_contaminated").count()

    t0 = time.time()
    report = contamination_report(
        docs.select("doc_id", "source", "text"), "src000"
    )
    found = report.agg(F.sum("n_contaminated")).head()[0]
    wall = time.time() - t0
    print(
        f"n={n} eval_slice={n // N_SOURCES} expected_contaminated={expected} "
        f"found={found} wall={wall:.1f}s"
    )
    assert found == expected, f"decontamination missed: {found} != {expected}"
    docs.unpersist()
    print("OK")


if __name__ == "__main__":
    main()
