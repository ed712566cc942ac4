#!/usr/bin/env python
"""End-to-end training-corpus CURATION pipeline smoke: quality filter →
exact dedup → near-dup dedup → benchmark decontamination → domain-capped
sampling → packing audit, composed from the package operators over a
synthetic 500k-doc corpus with KNOWN injected defects — so every stage's
drop count is assertable, not just plausible.

Usage: python scripts/scale_smoke_curation.py [n_base_docs]

Injected defects (all generated as JVM column expressions — no driver
data): exact duplicates (2%), near duplicates (first token mutated, 2%),
eval-contaminated docs (a 10-token span copied verbatim from a held-out
eval set, 1%), junk docs (one token repeated 60x, 1%). The pipeline must
remove exactly the defect slices and keep the clean base corpus.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from vectordb_similarity_search_spark.functions.text import tokens  # noqa: E402
from vectordb_similarity_search_spark.operators.dedup import (  # noqa: E402
    dedup_keep_canonical,
    minhash_lsh_pairs,
    substring_dup_stats,
)
from vectordb_similarity_search_spark.operators.sampling import (  # noqa: E402
    cluster_aware_split,
    grouped_cap_sample,
)
from vectordb_similarity_search_spark.session import get_spark  # noqa: E402

VOCAB = 5000
DOC_TOKS = 60
EVAL_DOCS = 1_000


def _tok_stream(key_col, n, seed):
    """n deterministic vocabulary tokens keyed by (key, position, seed)."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(n)),
        lambda i: F.format_string(
            "w%05d",
            F.pmod(F.xxhash64(key_col, i, F.lit(seed)), F.lit(VOCAB)),
        ),
    )


def gen_eval_set(spark):
    return spark.range(EVAL_DOCS).select(
        F.col("id").alias("eval_id"),
        F.array_join(_tok_stream(F.col("id"), DOC_TOKS, 999), " ").alias(
            "text"
        ),
    )


def gen_corpus(spark, n_base: int):
    """Base docs + the four defect slices, each tagged for assertions."""
    n_exact = n_base // 50
    n_near = n_base // 50
    n_contam = n_base // 100
    n_junk = n_base // 100

    def with_source(df):
        return df.withColumn(
            "source", F.format_string("domain_%d", F.pmod("doc_id", F.lit(5)))
        )

    base = spark.range(n_base).select(
        F.col("id").alias("doc_id"),
        F.array_join(_tok_stream(F.col("id"), DOC_TOKS, 1), " ").alias("text"),
        F.lit("base").alias("kind"),
    )
    off1 = n_base
    exact = spark.range(n_exact).select(
        (F.col("id") + off1).alias("doc_id"),
        F.array_join(_tok_stream(F.col("id"), DOC_TOKS, 1), " ").alias("text"),
        F.lit("exact_dup").alias("kind"),
    )
    off2 = off1 + n_exact
    near = spark.range(n_near).select(
        (F.col("id") + off2).alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("mutated"),
            F.array_join(
                F.slice(_tok_stream(F.col("id"), DOC_TOKS, 1), 2, DOC_TOKS - 1),
                " ",
            ),
        ).alias("text"),
        F.lit("near_dup").alias("kind"),
    )
    off3 = off2 + n_near
    contam = spark.range(n_contam).select(
        (F.col("id") + off3).alias("doc_id"),
        F.concat_ws(
            " ",
            F.array_join(
                _tok_stream(F.col("id") + off3, DOC_TOKS - 10, 1), " "
            ),
            # verbatim 10-token span of eval doc (id % EVAL_DOCS)
            F.array_join(
                F.slice(
                    _tok_stream(F.pmod("id", F.lit(EVAL_DOCS)), DOC_TOKS, 999),
                    1,
                    10,
                ),
                " ",
            ),
        ).alias("text"),
        F.lit("contaminated").alias("kind"),
    )
    off4 = off3 + n_contam
    junk = spark.range(n_junk).select(
        (F.col("id") + off4).alias("doc_id"),
        F.array_join(
            F.array_repeat(F.lit("spam"), DOC_TOKS), " "
        ).alias("text"),
        F.lit("junk").alias("kind"),
    )
    out = base
    for s in (exact, near, contam, junk):
        out = out.unionByName(s)
    return with_source(out), {
        "base": n_base,
        "exact_dup": n_exact,
        "near_dup": n_near,
        "contaminated": n_contam,
        "junk": n_junk,
    }


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    t0 = time.time()
    corpus, counts = gen_corpus(spark, n_base)
    corpus = corpus.persist()
    n0 = corpus.count()
    evals = gen_eval_set(spark).persist()
    evals.count()
    print(
        f"corpus {n0} docs ({counts}), eval {EVAL_DOCS}  "
        f"gen {time.time()-t0:.1f}s",
        flush=True,
    )
    funnel = [("generated", n0, 0.0)]

    # -- stage A: quality filter (distinct-token ratio kills the junk) ----
    t0 = time.time()
    toks = tokens("text")
    qual = corpus.where(
        F.size(toks).between(30, 100)
        & (F.size(F.array_distinct(toks)) / F.size(toks) > 0.3)
    ).persist()
    nA = qual.count()
    funnel.append(("quality", nA, time.time() - t0))
    kinds_A = {
        r.kind: r.c
        for r in qual.groupBy("kind").agg(F.count("*").alias("c")).collect()
    }
    assert "junk" not in kinds_A, kinds_A
    assert kinds_A["base"] == counts["base"], kinds_A

    # -- stage B: exact dedup (md5 groupwise keep-first) ------------------
    t0 = time.time()
    wb = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
        "doc_id"
    )
    exact_kept = (
        qual.withColumn("_rn", F.row_number().over(wb))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )
    nB = exact_kept.count()
    funnel.append(("exact_dedup", nB, time.time() - t0))
    assert nB == nA - counts["exact_dup"], (nA, nB)
    # linear funnel: each stage's cache is only needed to build the next
    # — release eagerly or the persisted copies of a 2M-doc corpus pile
    # up past the driver heap (the 100 TB-relevant hygiene too)
    qual.unpersist()
    corpus.unpersist()

    # -- stage C: near-dup dedup (word MinHash-LSH + keep canonical) ------
    t0 = time.time()
    pairs = minhash_lsh_pairs(
        exact_kept,
        threshold=0.8,
        bands=16,
        n_hashes=64,
        shingle_mode="word",
        shingle_n=3,
    )
    near_kept = dedup_keep_canonical(exact_kept, pairs).persist()
    nC = near_kept.count()
    funnel.append(("near_dedup", nC, time.time() - t0))

    # -- detector: leakage-free split over the SAME near-dup pair graph --
    # (runs on the pre-dedup corpus: the split is what you'd use if you
    # kept near-dups but needed them quarantined inside one split)
    t0 = time.time()
    asg = cluster_aware_split(
        exact_kept,
        pairs,
        {"train": 0.8, "val": 0.1, "test": 0.1},
        id_col="doc_id",
    ).persist()
    shares = {
        r.split: r.c
        for r in asg.groupBy("split").agg(F.count("*").alias("c")).collect()
    }
    straddle = (
        pairs.join(
            asg.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            asg.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    n_asg = sum(shares.values())
    assert straddle == 0, straddle
    assert abs(shares["train"] / n_asg - 0.8) < 0.01, shares
    assert abs(shares["val"] / n_asg - 0.1) < 0.005, shares
    assert abs(shares["test"] / n_asg - 0.1) < 0.005, shares
    print(
        f"  cluster_split: {shares} straddling_pairs=0  "
        f"{time.time()-t0:.1f}s",
        flush=True,
    )
    asg.unpersist()
    exact_kept.unpersist()
    kinds_C = {
        r.kind: r.c
        for r in near_kept.groupBy("kind")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert "near_dup" not in kinds_C, kinds_C
    assert kinds_C["base"] == counts["base"], kinds_C

    # -- detector: exact substring spans must isolate the contaminated
    # docs whose 10-token eval span recurs verbatim in ANOTHER doc
    # (contam doc i carries eval span i % EVAL_DOCS, so an eval id used
    # by >= 2 docs produces cross-doc 8-gram duplication the base corpus
    # cannot; eval ids used once are invisible to a cross-doc detector —
    # at the default 500k scale every eval id is used 5x, so the whole
    # slice is flagged; small runs double as the negative control) -------
    t0 = time.time()
    from collections import Counter

    reuse = Counter(i % EVAL_DOCS for i in range(counts["contaminated"]))
    expected_flagged = sum(v for v in reuse.values() if v >= 2)
    span_stats = substring_dup_stats(near_kept, k=8).where(
        F.col("dup_tokens") > 0
    )
    span_kinds = {
        r.kind: r.c
        for r in span_stats.join(near_kept.select("doc_id", "kind"), "doc_id")
        .groupBy("kind")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    bad_shape = (
        span_stats.where(
            (F.col("dup_spans") != 1) | (F.col("dup_tokens") != 10)
        ).count()
    )
    expected = {"contaminated": expected_flagged} if expected_flagged else {}
    assert span_kinds == expected, (span_kinds, expected)
    assert bad_shape == 0, bad_shape
    print(
        f"  substring_spans: flagged exactly the expected "
        f"{expected_flagged:,} cross-doc-contaminated docs "
        f"(1 span x 10 tokens each)  {time.time()-t0:.1f}s",
        flush=True,
    )

    # -- stage D: benchmark decontamination (word-5-gram collision) -------
    t0 = time.time()
    def grams5(c):
        tk = tokens(c)
        return F.transform(
            F.sequence(F.lit(1), F.size(tk) - 4),
            lambda i: F.concat_ws(
                " ", F.slice(tk, i, 5)
            ),
        )

    eval_grams = (
        evals.select(F.explode(grams5("text")).alias("g")).distinct()
    )
    flagged = (
        near_kept.select("doc_id", F.explode(grams5("text")).alias("g"))
        .join(F.broadcast(eval_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = near_kept.join(flagged, "doc_id", "left_anti").persist()
    nD = clean.count()
    funnel.append(("decontaminate", nD, time.time() - t0))
    near_kept.unpersist()
    kinds_D = {
        r.kind: r.c
        for r in clean.groupBy("kind").agg(F.count("*").alias("c")).collect()
    }
    assert "contaminated" not in kinds_D, kinds_D
    assert kinds_D["base"] == counts["base"], kinds_D

    # -- stage E: domain-capped sample (content-keyed, deterministic) -----
    t0 = time.time()
    cap = (n_base // 5) // 2  # keep ~half of each domain
    capped = grouped_cap_sample(clean, ["source"], cap, on=["doc_id"]).persist()
    nE = capped.count()
    clean.unpersist()
    funnel.append(("domain_cap", nE, time.time() - t0))
    assert nE == 5 * cap, nE

    # -- stage F: packing audit (1024-token sequences) --------------------
    t0 = time.time()
    total_toks = capped.agg(F.sum(F.size(tokens("text")))).head()[0]
    n_seqs = total_toks // 1024
    funnel.append(("packed_seqs", n_seqs, time.time() - t0))

    print("funnel:", flush=True)
    for name, rows, secs in funnel:
        print(f"  {name:>14}: {rows:>9,} rows  {secs:5.1f}s", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
