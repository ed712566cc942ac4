"""Distributed EXACT percentiles (round-10 optimization, guide §5).

Spark's ``percentile(col, q)`` aggregate is exact but buffers EVERY value
of the group in ONE task's ObjectHashAggregate — O(group) memory in a
single task, which at 100 TB is an OOM, not a slowdown (the round-9
verdict's #1 remaining scale problem). :func:`exact_percentiles` computes
the same order statistics as a lazy plan whose per-task state is bounded:

1. per group: ``(min, max)`` — one hash aggregate;
2. each value is mapped to an order-preserving bucket
   ``floor((v - min) / (max - min) * B)`` (monotone in IEEE double
   arithmetic: subtraction, division and multiplication by a positive
   constant are monotone non-decreasing, and the endpoints land exactly
   on 0 and B) — a second hash aggregate counts rows per (group, bucket);
3. a window over the ≤ B+1 buckets per group turns counts into exact
   cumulative rank ranges — bounded single-task work, O(B) not O(N);
4. only the buckets CONTAINING a target rank are re-scanned: rows are
   filtered to those buckets (a broadcast semi-sized join), duplicate
   values are collapsed by a (group, bucket, value) count, and a window
   per target bucket (≈ N/B rows, tie-compressed) assigns exact global
   ranks;
5. the two order statistics around ``pos = q·(n−1)`` interpolate with
   BIT-IDENTICAL arithmetic to Spark's Percentile.eval:
   ``(ceil(pos)−pos)·v_lo + (pos−floor(pos))·v_hi`` (and ``v_lo`` exactly
   when ``pos`` is integral) — verified bitwise against ``F.percentile``
   on random data in tests/test_percentiles.py.

Exactness does not depend on the bucket histogram being balanced — ranks
come from exact integer counts; B only bounds the per-task state of step
4 (worst case one bucket holds everything, e.g. a constant column, and
step 4 degrades to the tie-compressed distinct-value count of that
bucket).

Null handling matches the aggregate: null values are dropped before
counting (percentile ignores nulls; a group with only nulls disappears,
exactly as its aggregate row would carry NULL — callers that need such
groups must outer-join them back, none of the registry callers do).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Buckets per group. Bounds step-4 task state at ~N_group/4096 rows
# (tie-compressed); raising it shrinks the resolve scan per target but
# grows the (cheap, single-task-per-group) cumulative window of step 3.
N_BUCKETS = 4096


def _interp(pos, vlo, vhi):
    """Percentile.eval's interpolation arithmetic, shared by both exact
    formulations so the bit-exactness-critical expression cannot drift:
    v_lo when pos is integral; the counts-compressed tie short-circuit
    (v_lo when both ranks land on the same distinct value — the blended
    form is NOT exactly v in FP arithmetic, observed as a 1-ulp
    mismatch); else (ceil(pos)−pos)·v_lo + (pos−floor(pos))·v_hi."""
    return (
        F.when(F.ceil(pos).cast("double") == pos, vlo)
        .when(vlo == vhi, vlo)
        .otherwise(
            (F.ceil(pos).cast("double") - pos) * vlo
            + (pos - F.floor(pos).cast("double")) * vhi
        )
    )


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float],
    group_cols: Sequence[str] = (),
    *,
    out_col: str = "ps",
    n_buckets: int = N_BUCKETS,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact ``percentile(value_col, array(*qs))`` per group, distributed.

    Returns one row per group: ``group_cols + [out_col]`` where
    ``out_col`` is an ``array<double>`` aligned with ``qs`` — a drop-in
    for ``groupBy(*group_cols).agg(percentile(value_col, array(qs)))``
    bit-for-bit (same interpolation arithmetic as Spark's Percentile),
    without the O(group) single-task buffer.

    ``weight_col`` (an exact long repeat-count per row) makes the input a
    TIE-COMPRESSED cell frame: each ``(group, value, w)`` row stands for
    ``w`` identical observations. Callers whose value domain compresses
    (e.g. the qsk event stream, ~6x) aggregate cells ONCE before the 7x
    window explode, so this plan's three logical passes re-read a small
    aggregated exchange instead of re-scanning the exploded base — the
    round-10 fix for the qsk twins' pass-count regression. Rows with a
    NULL weight are invalid input; weights must be ≥ 1.
    """
    gcols = list(group_cols)
    qs = [float(q) for q in qs]
    v = F.col(value_col).cast("double")
    if weight_col is None:
        vals = df.filter(v.isNotNull()).select(*gcols, v.alias("_v"))
        cnt = lambda: F.count(F.lit(1))  # noqa: E731
    else:
        vals = df.filter(v.isNotNull()).select(
            *gcols, v.alias("_v"), F.col(weight_col).cast("long").alias("_w")
        )
        cnt = lambda: F.sum("_w")  # noqa: E731

    stats = vals.groupBy(*gcols).agg(
        F.min("_v").alias("_vmin"),
        F.max("_v").alias("_vmax"),
    )

    # Order-preserving bucket id in [0, n_buckets]; constant groups all
    # land in bucket 0. The stats side is group-cardinality — broadcast.
    def bucket_of(val):
        span = F.col("_vmax") - F.col("_vmin")
        return (
            F.when(span <= F.lit(0.0), F.lit(0))
            .otherwise(
                F.floor((val - F.col("_vmin")) / span * F.lit(float(n_buckets)))
                .cast("int")
            )
            .alias("_b")
        )

    # null-safe stats attach: a NULL group key is its own group (groupBy
    # semantics), but a plain equi-join would drop it
    st = stats.select(
        *[F.col(c).alias(f"_s_{c}") for c in gcols], "_vmin", "_vmax"
    )
    if gcols:
        jcond = F.lit(True)
        for c in gcols:
            jcond = jcond & F.col(c).eqNullSafe(F.col(f"_s_{c}"))
        joined = vals.join(F.broadcast(st), jcond)
    else:
        joined = vals.crossJoin(F.broadcast(st))
    wcols = [] if weight_col is None else ["_w"]
    bucketed = joined.select(*gcols, "_v", *wcols, bucket_of(F.col("_v")))

    bcounts = bucketed.groupBy(*gcols, "_b").agg(cnt().alias("_bc"))
    wb = Window.partitionBy(*gcols).orderBy("_b") if gcols else (
        Window.partitionBy(F.lit(0)).orderBy("_b")
    )
    # cumulative END rank of each bucket (1-indexed, inclusive); the
    # window holds ≤ n_buckets+1 rows per group — bounded, never O(N)
    bcum = bcounts.withColumn("_cum_end", F.sum("_bc").over(wb)).withColumn(
        "_cum_start", F.col("_cum_end") - F.col("_bc")
    )

    # target 1-indexed ranks: floor(pos)+1 and ceil(pos)+1 for each q,
    # pos = q*(n-1) in double — Spark Percentile's positions exactly.
    # n is derived IN the bucket frame (max cumulative end over the same
    # window partitioning — no extra exchange) rather than from `stats`,
    # so the base data is not re-scanned a fourth time just to learn the
    # group count; the rank→bucket containment is then a per-bucket-row
    # FILTER over ≤ 2·|qs| exploded candidates instead of a join.
    wg = Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(0))
    qarr = F.array(*[F.lit(q) for q in qs])
    targets = (
        bcum.withColumn("_n", F.max("_cum_end").over(wg))
        .select(
            *gcols,
            F.col("_b").alias("_tb"),
            F.col("_cum_start").alias("_tb_start"),
            "_cum_end",
            "_n",
            F.posexplode(qarr).alias("_qi", "_q"),
        )
        .select(
            *gcols,
            "_tb",
            "_tb_start",
            "_cum_end",
            "_qi",
            (F.col("_q") * (F.col("_n") - 1).cast("double")).alias("_pos"),
        )
        .select(
            *gcols,
            "_tb",
            "_tb_start",
            "_cum_end",
            "_qi",
            "_pos",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor("_pos").cast("long") + 1,
                        F.ceil("_pos").cast("long") + 1,
                    )
                )
            ).alias("_rank"),
        )
        .filter(
            (F.col("_rank") > F.col("_tb_start"))
            & (F.col("_rank") <= F.col("_cum_end"))
        )
        .select(*gcols, "_qi", "_pos", "_rank", "_tb", "_tb_start")
    )

    # resolve: re-scan only rows in target buckets, collapse ties, rank
    # distinct values within the bucket (≈ N/n_buckets rows per task)
    tkeys = targets.select(
        *[F.col(c).alias(f"_t_{c}") for c in gcols],
        F.col("_tb").alias("_t_b"),
    ).distinct()
    scond = F.col("_b") == F.col("_t_b")
    for c in gcols:
        scond = scond & F.col(c).eqNullSafe(F.col(f"_t_{c}"))
    in_target = bucketed.join(F.broadcast(tkeys), scond, "left_semi")
    vcounts = in_target.groupBy(*gcols, "_b", "_v").agg(cnt().alias("_vc"))
    wv = Window.partitionBy(*gcols, "_b").orderBy("_v")
    vranked = vcounts.withColumn("_v_cum", F.sum("_vc").over(wv)).withColumn(
        "_v_start", F.col("_v_cum") - F.col("_vc")
    )

    vr = vranked.select(
        *[F.col(c).alias(f"_g_{c}") for c in gcols],
        F.col("_b").alias("_vb"),
        "_v",
        "_v_start",
        "_v_cum",
    )
    # global rank range of a value = bucket start + local tie range
    rcond = (
        (F.col("_rank") > F.col("_tb_start") + F.col("_v_start"))
        & (F.col("_rank") <= F.col("_tb_start") + F.col("_v_cum"))
        & (F.col("_tb") == F.col("_vb"))
    )
    for c in gcols:
        rcond = rcond & F.col(c).eqNullSafe(F.col(f"_g_{c}"))
    # broadcast the TINY side: targets is ≤ 2·|qs| rows per group; vr is
    # the tie-compressed value set of the target buckets (~N/n_buckets
    # per group — unbounded at scale, must stay distributed; round-10
    # review finding)
    picked = vr.join(F.broadcast(targets), rcond).select(
        *gcols, "_qi", "_pos", "_rank", F.col("_v").alias("_ov")
    )

    lo_rank = F.floor("_pos").cast("long") + 1
    hi_rank = F.ceil("_pos").cast("long") + 1
    per_q = picked.groupBy(*gcols, "_qi", "_pos").agg(
        F.min(F.when(F.col("_rank") == lo_rank, F.col("_ov"))).alias("_vlo"),
        F.min(F.when(F.col("_rank") == hi_rank, F.col("_ov"))).alias("_vhi"),
    )
    per_q = per_q.select(
        *gcols,
        "_qi",
        _interp(F.col("_pos"), F.col("_vlo"), F.col("_vhi")).alias("_p"),
    )

    # reassemble the array in qs order
    agg = per_q.groupBy(*gcols).agg(
        F.array_sort(
            F.collect_list(F.struct("_qi", "_p"))
        ).alias("_qps")
    )
    return agg.select(
        *gcols,
        F.transform(F.col("_qps"), lambda s: s["_p"]).alias(out_col),
    )


def exact_percentiles_sorted(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float],
    group_cols: Sequence[str],
    *,
    out_col: str = "ps",
    weight_col: str | None = None,
) -> DataFrame:
    """Exact per-group percentiles via sort + cumulative-count window.

    The verdict's other in-plan exact formulation (guide §5): exchange
    once on the group key, sort each group by value, turn weights into
    exact cumulative rank ranges with a streaming running-sum window,
    keep only the ≤ 2·|qs| rows whose rank range contains a target
    position, and interpolate with Percentile.eval's arithmetic (same
    bit-identical formula as :func:`exact_percentiles`).

    Three exchanges total (group window, final agg, plus the caller's
    cell aggregate) versus the bucket plan's ~ten stages — the right
    shape when there are MANY groups (per-day / per-type): each group
    sorts independently and SortExec/WindowExec spill, so per-task
    memory stays bounded (no ObjectHashAggregate O(group) buffer; a
    group costs single-task streaming TIME, not heap). For ONE global
    group prefer :func:`exact_percentiles`, which distributes the rank
    resolution across buckets instead of funnelling N rows through one
    sort task.

    Rows may repeat a (group, value) pair (e.g. a window explode over
    pre-aggregated cells): cumulative ranks at value boundaries are
    unaffected, and whichever duplicate row carries the target rank
    yields the same value.
    """
    gcols = list(group_cols)
    qs = [float(q) for q in qs]
    v = F.col(value_col).cast("double")
    if weight_col is None:
        vals = df.filter(v.isNotNull()).select(
            *gcols, v.alias("_v"), F.lit(1).cast("long").alias("_w")
        )
    else:
        vals = df.filter(v.isNotNull()).select(
            *gcols, v.alias("_v"), F.col(weight_col).cast("long").alias("_w")
        )

    # The default orderBy frame is RANGE (… AND CURRENT ROW): every row
    # of a value TIE gets the same _end (cumulative through ALL ties),
    # so _start must subtract the tie's TOTAL weight (a [current,current]
    # RANGE frame), not the row's own — otherwise duplicate (group,
    # value) rows double-cover some ranks and miss others. All three
    # columns share one exchange + sort. An empty group list (a GLOBAL
    # percentile — callers should pre-compress to weighted cells first)
    # partitions on a constant.
    parts = [F.col(c) for c in gcols] or [F.lit(0)]
    ws = Window.partitionBy(*parts).orderBy("_v")
    wt = ws.rangeBetween(Window.currentRow, Window.currentRow)
    wg = Window.partitionBy(*parts)
    ranked = (
        vals.withColumn("_end", F.sum("_w").over(ws))
        .withColumn("_tiew", F.sum("_w").over(wt))
        .withColumn("_n", F.sum("_w").over(wg))
        .withColumn("_start", F.col("_end") - F.col("_tiew"))
    )

    # Spark Percentile's positions: pos = q·(n−1); the two order
    # statistics around it are ranks floor(pos)+1 and ceil(pos)+1
    # (1-indexed). A row covers ranks (_start, _end].
    poss = [
        (F.lit(q) * (F.col("_n") - 1).cast("double")).alias(f"_pos{i}")
        for i, q in enumerate(qs)
    ]
    ranked = ranked.select(*gcols, "_v", "_start", "_end", "_n", *poss)

    def _lo(i):
        return F.floor(f"_pos{i}").cast("long") + 1

    def _hi(i):
        return F.ceil(f"_pos{i}").cast("long") + 1

    def _covers(rank):
        return (rank > F.col("_start")) & (rank <= F.col("_end"))

    keep = F.lit(False)
    for i in range(len(qs)):
        keep = keep | _covers(_lo(i)) | _covers(_hi(i))
    hits = ranked.filter(keep)

    aggs = []
    for i in range(len(qs)):
        aggs.append(
            F.min(F.when(_covers(_lo(i)), F.col("_v"))).alias(f"_vlo{i}")
        )
        aggs.append(
            F.min(F.when(_covers(_hi(i)), F.col("_v"))).alias(f"_vhi{i}")
        )
        aggs.append(F.min(f"_pos{i}").alias(f"_p{i}"))
    per_g = hits.groupBy(*gcols).agg(*aggs)

    outs = [
        _interp(F.col(f"_p{i}"), F.col(f"_vlo{i}"), F.col(f"_vhi{i}"))
        for i in range(len(qs))
    ]
    return per_g.select(*gcols, F.array(*outs).alias(out_col))
