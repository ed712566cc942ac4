"""Heavy hitters over an unbounded key domain: Misra–Gries candidates +
exact recount.

The scale problem (reference analogue: the frequency/top-k reports built by
pandas ``value_counts`` in similarity_search.py's summary paths): a plain
``groupBy(key).count()`` over a 100 TB corpus shuffles one partial count per
distinct key per map task. When the key domain is huge (URLs, n-grams,
user-ids) and only the top-k matter, almost all of that exchange is wasted
on keys that can never rank.

Shape here (two narrow passes, no wide shuffle over the key domain):

1. **Candidate generation** — one scan, per-partition Misra–Gries summaries
   with ``capacity`` counters inside an Arrow ``mapInPandas`` stage. Each
   partition emits at most ``capacity`` candidate keys plus one row-count
   marker row, so the stage's output is ``<= partitions * (capacity + 1)``
   rows regardless of input size or key cardinality.
2. **Exact recount** — second scan, filtered by a **broadcast semi join**
   against the candidate set, then an ordinary partial+final count
   aggregation over only the candidate keys.

Guarantee (classic MG bound, proved per partition with the batched
decrement below): any key with global frequency ``> n / (capacity + 1)``
survives in at least one partition's summary. The final plan therefore
certifies exactness lazily: if the k-th returned count is not strictly
above ``n / (capacity + 1)``, the returned top-k could in principle miss a
key, and the plan raises instead of returning possibly-wrong rows
(``F.raise_error`` under the certificate predicate — same lazy-failure
discipline as ml/quality.py).

Batched MG decrement correctness: when a partition's counter table exceeds
``capacity`` by ``e`` entries, we subtract ``delta`` (the ``e``-th smallest
count) from every counter and drop the non-positive ones — at least ``e``
counters die, and the ``capacity + 1`` largest counters each lose exactly
``delta``, so every unit of ``delta`` consumes ``>= capacity + 1`` units of
total mass. Total decrement per partition is thus ``<= n_p / (capacity+1)``,
which is the textbook one-at-a-time MG bound.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def mg_partition_candidates(
    df: DataFrame, col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra–Gries pass.

    Returns a small DataFrame with columns ``(key, part_rows)``:
    - one row per surviving counter, ``key`` = candidate value,
      ``part_rows`` NULL;
    - exactly one marker row per non-empty partition, ``key`` NULL,
      ``part_rows`` = number of input rows in that partition (so the total
      input size is recoverable downstream without a second scan).

    NULL input keys are counted into ``part_rows`` (they are rows) but are
    never candidates — a NULL key cannot be distinguished from the marker
    rows, and "NULL is a heavy hitter" is a data-quality signal the caller
    should test for explicitly (``r_table_profile`` covers null rates).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    key_field = df.schema[col]
    out_schema = StructType(
        [
            StructField("key", key_field.dataType, True),
            StructField("part_rows", LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Counters live in a pandas Series (value -> count): the per-batch
        # merge is an index-aligned add in C, not a Python dict loop —
        # ~10x the throughput at 4k-counter capacity over ~10k-row Arrow
        # batches (measured in scripts/scale_smoke_heavyhitters.py).
        acc: pd.Series | None = None
        n_rows = 0
        for pdf in batches:
            s = pdf[col]
            n_rows += len(s)
            vc = s.dropna().value_counts()  # C-speed per-batch pre-agg
            if acc is None:
                acc = vc.astype("int64")
            else:
                acc = acc.add(vc, fill_value=0).astype("int64")
            excess = len(acc) - capacity
            if excess > 0:
                vals = acc.to_numpy()
                delta = int(np.partition(vals, excess - 1)[excess - 1])
                acc = acc[vals > delta] - delta
        if n_rows == 0:
            return
        keys = [] if acc is None else list(acc.index)
        # dtype=object keeps integer keys exact (a default float64 column
        # would NaN-pad the marker row and round large int64 keys).
        yield pd.DataFrame(
            {
                "key": pd.Series(keys + [None], dtype="object"),
                "part_rows": pd.Series(
                    [None] * len(keys) + [n_rows], dtype="object"
                ),
            }
        )

    return df.select(col).mapInPandas(run, schema=out_schema)


def heavy_hitters(
    df: DataFrame, col: str, k: int, *, capacity: int = 4096
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``df[col]`` — or a runtime
    error if exactness cannot be certified.

    Returns ``(col, cnt, rank)`` ordered by ``(cnt desc, col asc)`` with a
    deterministic tie-break. The result is **provably exact** whenever the
    k-th count exceeds ``n / (capacity + 1)``; the certificate is evaluated
    inside the plan and violations raise rather than under-report (raise
    ``capacity`` if that happens — memory per task is ``O(capacity)``).

    One lazy plan, two source scans, nothing driver-side.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    mg = mg_partition_candidates(df, col, capacity)
    # Window totals over the tiny MG output (<= partitions*(capacity+1)
    # rows): one single-partition exchange, no re-scan of the source per
    # reference (plan-audit learning #1 in ROUND_NOTES). The same bound is
    # what makes the final global rank window below safe: it runs over the
    # candidate-only recount, never the raw key domain.
    w_all = Window.partitionBy()
    mg = mg.select(
        "key",
        F.sum("part_rows").over(w_all).alias("_n_total"),
    )
    cand = mg.where(F.col("key").isNotNull()).dropDuplicates(["key"])
    exact = (
        df.select(F.col(col))
        .join(
            F.broadcast(cand.withColumnRenamed("key", col)),
            on=col,
            how="left_semi",
        )
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    # Re-attach n (constant) for the certificate: broadcast the 1-row total.
    total = cand.select(F.col("_n_total").alias("_n")).limit(1)
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col(col).asc())
    ranked = (
        exact.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .where(F.col("rank") <= k)
    )
    threshold = F.col("_n").cast("double") / F.lit(float(capacity + 1))
    certified_cnt = F.when(
        F.col("cnt").cast("double") > threshold, F.col("cnt")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "heavy_hitters: top-k not certified exact — rank-"
                ),
                F.col("rank").cast("string"),
                F.lit(" count "),
                F.col("cnt").cast("string"),
                F.lit(" <= n/(capacity+1); raise capacity"),
            )
        )
    )
    return ranked.select(
        F.col(col),
        certified_cnt.alias("cnt"),
        "rank",
    )
