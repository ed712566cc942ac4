"""Fuzzy record linkage: blocked edit-distance self-pairing.

Classic entity-resolution shape (the reference has no linkage operator;
this covers the "same entity, slightly different string" step every
training-data pipeline hits on titles/authors/URLs): an all-pairs
``levenshtein`` is O(N²) and unrunnable at corpus scale, so candidate
pairs are generated only WITHIN a caller-chosen blocking key (first word,
soundex, length bucket, …) and the exact distance filter runs on those
candidates alone.

Execution shape (same one-shuffle pattern as operators/dedup.py's bucket
self-join): distinct names → hash exchange on the block key →
``collect_list`` per block → in-array ordered pair generation (no second
shuffle, no self-join) → JVM ``levenshtein`` filter. The shuffle moves
each name once; pair blowup is bounded because a block of B names emits
at most B² pairs and B is capped.

Skew guard: a degenerate block (every name sharing one first word) would
explode quadratically; blocks larger than ``max_block`` RAISE inside the
plan (``F.raise_error`` — linkage silently dropping a block would change
answer semantics, unlike dedup where dropping a boilerplate bucket is the
documented recall trade). Choose a finer blocking key or raise the cap.

At 100 TB: the distinct + exchange is one shuffle of (name, block) pairs;
per-block state is ``O(max_block)`` names per task. Multi-key blocking
(union of several blocking passes + ``dropDuplicates`` on the pair) is the
standard recall extension and composes directly with this operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_self_pairs(
    df: DataFrame,
    col: str,
    block: Column,
    max_dist: int,
    *,
    max_block: int = 5000,
) -> DataFrame:
    """Distinct-value fuzzy pairs of ``df[col]`` within blocks.

    Returns ``(name_a, name_b, edit_dist)`` with ``name_a < name_b`` (each
    unordered pair once) and ``edit_dist <= max_dist``. NULLs are dropped
    (no distance to NULL); duplicates of the same value never pair with
    themselves (distinct first, strict ``<``).

    ``block`` is a Column expression over the normalized ``name`` column
    (the operator aliases ``df[col]`` to ``name`` before applying it), e.g.
    ``F.substring_index(F.col("name"), " ", 1)`` or
    ``F.soundex(F.col("name"))``.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    names = (
        df.select(F.col(col).alias("name"))
        .where(F.col("name").isNotNull())
        .distinct()
        .withColumn("_blk", block)
    )
    sized = names.groupBy("_blk").agg(F.collect_list("name").alias("names"))
    guarded = sized.select(
        "_blk",
        F.when(F.size("names") <= max_block, F.col("names"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("fuzzy_self_pairs: block "),
                    F.col("_blk").cast("string"),
                    F.lit(f" exceeds max_block={max_block}; refine the "),
                    F.lit("blocking key or raise the cap"),
                )
            )
        )
        .alias("names"),
    ).where(F.size("names") > 1)
    # Ordered pairs inside the block array; the |len| prefilter is implied
    # by levenshtein <= max_dist but prunes cheaply before the O(len²) DP.
    pairs = guarded.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("names"),
                    lambda a: F.transform(
                        F.filter(
                            F.col("names"),
                            lambda b: (b > a)
                            & (
                                F.abs(F.length(b) - F.length(a))
                                <= F.lit(max_dist)
                            ),
                        ),
                        lambda b: F.struct(
                            a.alias("name_a"), b.alias("name_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.name_a", "p.name_b")
    return (
        pairs.withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("int")
        )
        .where(F.col("edit_dist") <= max_dist)
    )
