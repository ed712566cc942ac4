"""Materialized inverted index for lexical retrieval — the text analogue
of the written IVF index (operators/ann.py): posting lists built once
offline, served by partition-pruned scans.

The scan-path BM25 (operators/bm25.py) re-tokenizes the whole corpus per
query — the right plan for ad-hoc analytics, the wrong one for a serving
workload. This module materializes the classic IR layout instead:

- ``postings/`` — one row per (term, doc): ``(term, doc id, tf, dl)``,
  hash-partitioned into ``bucket=<b>`` directories by a Python-computable
  md5 bucket of the term. A query for a handful of terms reads ONLY the
  buckets those terms hash to (PartitionFilters) and only matching terms
  within them (PushedFilters) — at 100 TB a 3-term query touches
  3/``num_buckets`` of the store instead of re-scanning every document.
  Document length rides denormalized on each posting row (impact-file
  style) so scoring needs no doc-table join.
- ``_stats/terms`` — per-term document frequency (corpus-vocabulary rows).
- ``_stats/meta`` — one row: doc count + average doc length.
- ``_meta.json`` — sidecar with ``num_buckets`` (read with plain Python at
  query build: no Spark job, same trick as the zone-map sidecar).

Scoring reuses ``bm25.bm25_score_expr`` — the SAME fixed-order folded
expression as the scan path, with per-term tf pivoted to columns after
the pruned scan (a groupBy float sum would reassociate the adds), so the
indexed top-k is bit-identical to ``bm25_topk`` whenever every result doc
contains at least one query term. That is the one semantic caveat of any
inverted index: zero-match documents are unrepresented, so fewer than k
rows come back when fewer than k docs match any term (the scan path would
pad with zero-score docs). Stats are build-time snapshots: appending
documents requires rebuilding ``_stats`` (df/avgdl are corpus-global), so
the store is rebuild-on-append by design — rebuild cost is one
tokenize+groupBy pass, the same shape as the initial build.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import n_tokens, tokens
from .ann import _index_scan, _invalidate_index_scans
from .bm25 import bm25_score_expr


def _py_bucket(term: str, num_buckets: int) -> int:
    """Python side of the term→bucket hash."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16) % num_buckets


def _jvm_bucket(term_col, num_buckets: int):
    """JVM side of the term→bucket hash — md5 hex prefix parsed base-16,
    identical to :func:`_py_bucket` (15 hex digits = 60 bits, inside long
    range; parity pinned in tests/test_invindex.py)."""
    return F.pmod(
        F.conv(F.substring(F.md5(term_col.cast("binary")), 1, 15), 16, 10).cast(
            "long"
        ),
        F.lit(num_buckets),
    ).cast("int")


def text_index_write(
    docs: DataFrame,
    path: str,
    *,
    num_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Build and write the inverted index. One tokenize+explode pass:
    postings via (id, term) groupBy — the shuffle carries (term, id, tf)
    rows, never text — then df per term and the 1-row corpus stats as
    by-products of the same posting frame. The json sidecar is written
    LAST (commit marker): a reader never sees a store whose postings and
    stats disagree."""
    posted = (
        docs.select(
            F.col(id_col),
            F.explode(tokens(text_col)).alias("term"),
            n_tokens(text_col).cast("double").alias("dl"),
        )
        .groupBy(id_col, "term", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn("bucket", _jvm_bucket(F.col("term"), num_buckets))
    )
    posted.write.partitionBy("bucket").mode("overwrite").parquet(
        f"{path.rstrip('/')}/postings"
    )
    post_scan = docs.sparkSession.read.parquet(f"{path.rstrip('/')}/postings")
    post_scan.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path.rstrip('/')}/_stats/terms"
    )
    docs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum(n_tokens(text_col).cast("double")) / F.count(F.lit(1))).alias(
            "avgdl"
        ),
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path.rstrip('/')}/_stats/meta"
    )
    tmp = f"{path.rstrip('/')}/_meta.json.tmp"
    with open(tmp, "w") as f:
        json.dump({"num_buckets": num_buckets, "id_col": id_col}, f)
    os.replace(tmp, f"{path.rstrip('/')}/_meta.json")
    _invalidate_index_scans(f"{path.rstrip('/')}/postings")


def bm25_topk_indexed(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 served from the written index. Plan shape: ONE
    partition-pruned scan of the query terms' buckets (bucket IN (...) in
    PartitionFilters, term IN (...) in PushedFilters — pinned in
    tests/test_invindex.py), per-term tf pivoted to columns by a doc-id
    groupBy over only the matching postings, corpus stats and per-term df
    crossJoined in as broadcast 1-row aggregates (lazy — zero jobs at
    build), then the shared fixed-order score fold and a TakeOrdered
    top-k. The exchanges move posting rows for the query terms only —
    at 100 TB that is |matching docs|·|terms| tiny rows, never the corpus."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    with open(f"{path.rstrip('/')}/_meta.json") as f:
        meta = json.load(f)
    num_buckets, id_col = meta["num_buckets"], meta["id_col"]
    buckets = sorted({_py_bucket(t, num_buckets) for t in query_terms})
    post = (
        _index_scan(spark, f"{path.rstrip('/')}/postings")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(query_terms))
    )
    pivoted = post.groupBy(id_col).agg(
        F.max("dl").alias("_len"),
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
            )
            .cast("double")
            .alias(f"_tf{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = _index_scan(spark, f"{path.rstrip('/')}/_stats/meta").select(
        F.col("n").alias("_n"), F.col("avgdl").alias("_avgdl")
    )
    dfs = (
        _index_scan(spark, f"{path.rstrip('/')}/_stats/terms")
        .filter(F.col("term").isin(query_terms))
        .agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("term") == t, F.col("df"))), F.lit(0.0)
                ).alias(f"_df{i}")
                for i, t in enumerate(query_terms)
            ]
        )
    )
    scored = pivoted.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(dfs))
    score = bm25_score_expr(len(query_terms), k1, b)
    return (
        scored.select(id_col, F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )
