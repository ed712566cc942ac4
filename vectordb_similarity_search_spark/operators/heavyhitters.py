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
   partition emits at most ``capacity`` candidate keys plus one marker row
   carrying (partition row count, decrement-event count), so the stage's
   output is ``<= partitions * (capacity + 1)`` rows regardless of input
   size or key cardinality.
2. **Exact recount** — second scan, filtered by a **broadcast join**
   against the candidate set, then an ordinary partial+final count
   aggregation over only the candidate keys. The MG subtree is referenced
   exactly once (as the broadcast side), so the expensive Arrow scan runs
   once per action — the corpus totals and eviction counts ride the
   candidate rows as window-sum constants instead of a second MG-derived
   broadcast (round-4 review: the old separate 1-row ``total`` subplan did
   not canonicalize with the candidate subplan and re-ran the full MG scan).

Exactness contract — the returned top-k is **provably exact, or the plan
raises**; it never silently under-reports. Three certificates cover every
case (classic MG bound: any key with global frequency ``> n/(capacity+1)``
survives in at least one partition's summary):

- **No evictions anywhere** (``sum(part_evict) == 0``): the candidate set
  is ALL distinct keys, the recount is a complete groupBy — exact by
  construction, including when the domain has fewer than ``k`` keys (the
  full domain is returned, like the plain groupBy would).
- **Evictions happened, >= k candidates survive**: each returned row must
  beat the MG threshold ``n/(capacity+1)`` (ranks 1..k-1 dominate rank k,
  so the per-row check is equivalent to checking rank k) — an omitted key
  can have count at most the threshold, so nothing can displace the
  returned set. Violations ``raise_error`` in the plan.
- **Evictions happened, fewer than k candidates survive** (the silent-
  truncation case the round-4 review caught empirically): a shortfall row
  count cannot be certified, so the plan raises — via the per-row
  ``max(rank) >= k`` check when candidates exist, and via a raise folded
  into the broadcast-side KEY PROJECTION (a poisoned key value) when MG
  evicted *everything*: marker rows are always present for non-empty
  input, and putting the raise inside the key expression — NOT in a
  filter, which the join's inferred ``isnotnull(key)`` pushdown would
  defeat — guarantees it evaluates even though the result would be
  empty.

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

    Returns a small DataFrame with columns ``(key, part_rows, part_evict)``:
    - one row per surviving counter, ``key`` = candidate value, marker
      columns NULL;
    - exactly one marker row per non-empty partition, ``key`` NULL,
      ``part_rows`` = number of input rows in that partition and
      ``part_evict`` = number of decrement events it performed (so both
      the total input size and whether ANY counter was ever evicted are
      recoverable downstream without a second scan).

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
            StructField("part_evict", LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Counters live in a pandas Series (value -> count): the per-batch
        # merge is an index-aligned add in C, not a Python dict loop —
        # ~10x the throughput at 4k-counter capacity over ~10k-row Arrow
        # batches (measured in scripts/scale_smoke_heavyhitters.py).
        acc: pd.Series | None = None
        n_rows = 0
        n_evict = 0
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
                n_evict += 1
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
                "part_evict": pd.Series(
                    [None] * len(keys) + [n_evict], dtype="object"
                ),
            }
        )

    return df.select(col).mapInPandas(run, schema=out_schema)


def heavy_hitters(
    df: DataFrame, col: str, k: int, *, capacity: int = 4096
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``df[col]`` — or a runtime
    error if exactness cannot be certified (see the module docstring for
    the three certificates; raise ``capacity`` on a certification failure —
    memory per task is ``O(capacity)``).

    Returns ``(col, cnt, rank)`` ordered by ``(cnt desc, col asc)`` with a
    deterministic tie-break. When the key domain has fewer than ``k``
    distinct values and no eviction occurred, the whole (exact) domain is
    returned, like the plain groupBy it replaces.

    One lazy plan, two source scans (one MG, one recount), nothing
    driver-side.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key_field = df.schema[col]
    mg = mg_partition_candidates(df, col, capacity)
    # Window totals over the tiny MG output (<= partitions*(capacity+1)
    # rows): one single-partition exchange, no re-scan of the source per
    # reference (plan-audit learning #1 in ROUND_NOTES). Attaching the
    # totals to every candidate row keeps the MG subtree referenced
    # exactly once below.
    w_all = Window.partitionBy()
    mg = mg.select(
        "key",
        F.sum("part_rows").over(w_all).alias("_n"),
        F.sum("part_evict").over(w_all).alias("_evict"),
        F.count("key").over(w_all).alias("_n_cand"),
    )
    # All-evicted tripwire: marker rows (key NULL) exist for every
    # non-empty partition, so if MG evicted every counter (_n_cand == 0)
    # while input existed, the raise must fire — otherwise an empty
    # candidate set would flow through joins into a silently-empty
    # "top-k". The raise is folded into the key PROJECTION (a poisoned
    # key value), not the filter: the inner join below makes Catalyst
    # infer `isnotnull(join key)` and push it beneath any filter we wrote,
    # which would prune the marker rows before a filter-side raise ever
    # evaluated (observed in the round-4 review repro). With the raise
    # inside the key expression, every null check on the join key has to
    # evaluate it — on the all-evicted marker row that evaluation IS the
    # error.
    all_evicted = (
        (F.col("_n_cand") == 0)
        & (F.col("_evict") > 0)
        & F.col("key").isNull()
    )
    key_or_raise = F.when(
        all_evicted,
        F.raise_error(
            F.lit(
                "heavy_hitters: top-k not certified exact — MG "
                "evicted every counter (no candidate survived); "
                "raise capacity"
            )
        ).cast(key_field.dataType.simpleString()),
    ).otherwise(F.col("key"))
    cand = (
        mg.select(
            key_or_raise.alias("key"), "_n", "_evict"
        )
        .where(F.col("key").isNotNull())
        .dropDuplicates(["key"])
        .withColumnRenamed("key", col)
    )
    exact = (
        df.select(F.col(col))
        .join(F.broadcast(cand), on=col, how="inner")
        .groupBy(col)
        .agg(
            F.count("*").alias("cnt"),
            F.first("_n").alias("_n"),
            F.first("_evict").alias("_evict"),
        )
    )
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col(col).asc())
    ranked = (
        exact.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .withColumn("_m", F.max("rank").over(w_all))
        .where(F.col("rank") <= k)
    )
    threshold = F.col("_n").cast("double") / F.lit(float(capacity + 1))
    certified_cnt = (
        # no eviction anywhere -> candidates are ALL keys, recount complete
        F.when(F.col("_evict") == 0, F.col("cnt"))
        # evictions happened: need a full k rows, each above the MG bound
        .when(
            (F.col("_m") >= k) & (F.col("cnt").cast("double") > threshold),
            F.col("cnt"),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "heavy_hitters: top-k not certified exact — rank-"
                    ),
                    F.col("rank").cast("string"),
                    F.lit(" count "),
                    F.col("cnt").cast("string"),
                    F.lit(" (candidates "),
                    F.col("_m").cast("string"),
                    F.lit(" of k, threshold n/(capacity+1)); raise capacity"),
                )
            )
        )
    )
    return ranked.select(
        F.col(col),
        certified_cnt.alias("cnt"),
        "rank",
    )
