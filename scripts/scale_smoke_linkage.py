#!/usr/bin/env python
"""Entity resolution at scale (~0.7*SMOKE_NAMES names — 350k at the
default) under a vanilla SparkSession.

What it proves (the r_entity_resolution / operators/linkage +
operators/dedup.dedup_clusters scale claims):

- blocked fuzzy pairing over 350k distinct names is ONE (name, block)
  exchange + per-block in-array levenshtein — no N x N join;
- min-label propagation recovers EXACTLY the injected typo clusters:
  every variant lands with its cluster, every decoy (same block, far
  edit distance) stays out, purity holds in BOTH directions;
- canonical (min-name) golden records are deterministic.

Corpus shape: N/5 entities (~0.7N names), each a cluster of 2-4 typo variants of a
base name (1-char edits in a suffix word, block word intact) plus one
far-away DECOY sharing the block word — the false-merge bait. Cluster
base words are unique, so a cross-cluster merge can only come from the
operator, never the generator.

    python scripts/scale_smoke_linkage.py          # ~350k names, ~1 min
    SMOKE_NAMES=2000000 python scripts/...         # ~1.4M names
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_NAMES = int(os.environ.get("SMOKE_NAMES", 500_000))

failures: list[str] = []


def check(name: str, ok: bool, detail: str = "") -> None:
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}", flush=True)
    if not ok:
        failures.append(name)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vectordb_similarity_search_spark.operators.dedup import (
        dedup_clusters,
    )
    from vectordb_similarity_search_spark.operators.linkage import (
        fuzzy_self_pairs,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("scale-smoke-linkage")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # one row per (cluster, slot): slot 0 = base, slots 1..size-1 = typo
    # variants (one suffix char replaced, deterministic), last slot =
    # decoy (entirely different suffix words — far past max_dist)
    n_clusters = N_NAMES // 5
    base = spark.range(n_clusters).select(F.col("id").alias("cid"))
    slots = base.select(
        "cid",
        F.explode(
            F.sequence(F.lit(0), F.lit(2) + (F.pmod(F.xxhash64("cid"), 2)).cast("int"))
        ).alias("slot"),
    )
    block_w = F.format_string("e%07d", F.col("cid"))
    sfx1 = F.format_string("a%08d", F.pmod(F.xxhash64("cid", F.lit(1)), 10_000_000))
    sfx2 = F.format_string("b%08d", F.pmod(F.xxhash64("cid", F.lit(2)), 10_000_000))
    # variant v (v >= 1): replace the (v mod 8)+2-th char of sfx1 with 'x'
    # (digits only there, so the edit distance to the base is exactly 1)
    vpos = (F.pmod(F.col("slot"), 8) + 2).cast("int")
    variant_sfx1 = F.concat(
        F.substring(sfx1, F.lit(1), vpos - 1),
        F.lit("x"),
        F.substring(sfx1, vpos + 1, F.lit(9)),
    )
    decoy_sfx = F.concat(
        F.format_string("z%08d", F.pmod(F.xxhash64("cid", F.lit(3)), 10_000_000)),
        F.lit(" "),
        F.format_string("q%08d", F.pmod(F.xxhash64("cid", F.lit(4)), 10_000_000)),
    )
    from pyspark.sql import Window

    max_slot = F.max("slot").over(Window.partitionBy("cid"))
    named = slots.withColumn("_mx", max_slot).select(
        "cid",
        "slot",
        F.when(
            F.col("slot") == F.col("_mx"),  # decoy
            F.concat(block_w, F.lit(" "), decoy_sfx),
        )
        .when(
            F.col("slot") == 0,  # base
            F.concat(block_w, F.lit(" "), sfx1, F.lit(" "), sfx2),
        )
        .otherwise(  # typo variant
            F.concat(block_w, F.lit(" "), variant_sfx1, F.lit(" "), sfx2)
        )
        .alias("name"),
        (F.col("slot") == F.col("_mx")).alias("is_decoy"),
    )
    work = named.persist()
    n_rows = work.count()
    n_members = work.filter(~F.col("is_decoy")).count()
    print(f"corpus: {n_rows} names, {n_clusters} clusters, "
          f"{n_members} true members", flush=True)

    t0 = time.perf_counter()
    pairs = fuzzy_self_pairs(
        work, "name", F.substring_index(F.col("name"), " ", 1), 3
    )
    comp = dedup_clusters(pairs, id_a="name_a", id_b="name_b")
    comp = comp.persist()
    n_clustered = comp.count()
    wall = time.perf_counter() - t0
    print(f"pairs+components wall: {wall:.1f}s", flush=True)

    check(
        "every_true_member_clustered_no_decoy",
        n_clustered == n_members,
        f"clustered={n_clustered} want={n_members}",
    )
    # decoys must be absent from comp entirely
    n_decoys_in = (
        comp.join(
            work.filter(F.col("is_decoy")).select(
                F.col("name").alias("doc_id")
            ),
            "doc_id",
        ).count()
    )
    check("decoys_stay_out", n_decoys_in == 0, f"decoys_in={n_decoys_in}")

    # purity both directions: each component maps to exactly one cid and
    # each cid to exactly one component
    lab = comp.join(
        work.select(F.col("name").alias("doc_id"), "cid"), "doc_id"
    )
    mixed = (
        lab.groupBy("cluster_id")
        .agg(F.countDistinct("cid").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    split = (
        lab.groupBy("cid")
        .agg(F.countDistinct("cluster_id").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    check("no_cross_cluster_merge", mixed == 0, f"mixed_components={mixed}")
    check("no_cluster_split", split == 0, f"split_clusters={split}")

    # canonical = min name per cid
    bad_canon = (
        lab.groupBy("cid")
        .agg(
            F.min("doc_id").alias("min_name"),
            F.first("cluster_id").alias("canon"),
        )
        .filter(F.col("min_name") != F.col("canon"))
        .count()
    )
    check("canonical_is_min_member", bad_canon == 0, f"bad={bad_canon}")

    print(f"{'OK' if not failures else 'FAILED'} ({5 - len(failures)}/5)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
