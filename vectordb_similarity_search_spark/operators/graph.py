"""Distributed graph ranking over DataFrame edge lists.

PageRank here is built for the engine's determinism contract: every
iteration works in exact int64 rank units (1.0 = RANK_SCALE), so
per-node sums are order-independent and the result after ``n_iter``
power iterations is BIT-IDENTICAL across partition layouts, core counts
and sessions — the same quantize-before-sum discipline as
ml/quality.fit_quality_classifier. Floats appear only in the final
display projection.

Execution model: this is an ITERATIVE OFFLINE BUILD, not a lazy query
plan — each power iteration materializes via ``localCheckpoint`` (the
standard Spark idiom for iterative algorithms; without it the logical
plan nests exponentially in the iteration count). It therefore runs
jobs at call time, like operators/dedup.dedup_clusters, and catalog
queries using it are exempt from the zero-job-build contract the same
way d_dedup_keep is.

Connected components for dedup live in operators/dedup.dedup_clusters;
this module covers importance ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 1.0 rank unit in int64 units. 1e9 bounds the worst-case update term
# (damping_pct * total_mass = 100 * n_nodes * RANK_SCALE) under int64
# for graphs up to ~9e7 nodes; per-unit quantization is 1e-9 rank.
# The link pass additionally computes r * w, bounded by
# total_mass * max(out_w) — pagerank() validates that product fits
# int64 at build time and raises instead of overflowing.
RANK_SCALE = 1_000_000_000

_INT64_MAX = (1 << 63) - 1


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    n_iter: int = 8,
    damping_pct: int = 85,
) -> DataFrame:
    """Weighted PageRank over a directed edge list: exact-integer
    arithmetic, fixed ``n_iter`` power iterations, conserved mass.

    Returns (node, rank_units int64, rank double) with the "ranks sum to
    n_nodes" convention (init 1.0 per node). ``damping_pct`` is an
    INTEGER percentage (85 = the textbook 0.85) so damping stays exact.

    Per iteration, in int64 units:

    - ``inbound(v) = Σ_{u→v} (r_u * w_uv) div out_u`` — the link pass,
      one join of ranks onto the persisted edge list + one partial-agg
      groupBy on the destination (the Pregel-style exchange);
    - ``missing = Σ_u r_u − Σ_v inbound(v)`` — dangling-node mass plus
      integer-division remainders, redistributed uniformly so total mass
      is conserved up to per-node truncation: the final ``div 100`` loses
      < 1 unit/node and the ``missing div N`` share loses < 1 unit/node,
      so drift is < 2·n_nodes units per iteration (< 2e-9 rank/node at
      default scale);
    - ``r'_v = (S·(100−p) + p·(inbound(v) + missing div N)) div 100``.

    All divisions are int64 ``div`` — deterministic under any layout, so
    the fixed-iteration result is reproducible bit-for-bit (the property
    tests/test_graph.py pins against a pure-Python replica).
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not (isinstance(damping_pct, int) and 1 <= damping_pct <= 99):
        raise ValueError("damping_pct must be an integer in [1, 99]")

    w_col = (
        F.col(weight).cast("long")
        if weight is not None
        else F.lit(1).cast("long")
    )
    e = (
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"), w_col.alias("w")
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        # per-source outgoing weight rides the edge rows: a window over
        # the src exchange, no second pass over the edge source
        .withColumn("out_w", F.sum("w").over(Window.partitionBy("src")))
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.select(
        "node", F.lit(RANK_SCALE).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    # scalar constants of the iteration (one tiny job each, off the
    # checkpointed 1-column frames — build work, not query work)
    n_nodes = ranks.count()
    max_out_w = e.agg(F.max("out_w")).first()[0] or 1
    # Worst-case int64 bounds, checked up front so a weighted graph
    # raises instead of overflowing (ANSI) or wrapping (legacy):
    # the link pass computes r * w with r <= total_mass and w <= out_w;
    # the update term computes damping_pct * (inbound + share) <= 100 *
    # total_mass.
    total_mass = n_nodes * RANK_SCALE
    if total_mass > _INT64_MAX // max(100, max_out_w):
        raise ValueError(
            f"pagerank int64 overflow risk: n_nodes={n_nodes} with "
            f"max per-source weight {max_out_w} exceeds the exact-integer "
            f"budget (need n_nodes * {RANK_SCALE} * max(100, max_out_w) "
            "<= 2^63-1); rescale edge weights"
        )

    for _ in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("r * w div out_w").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inbound"))
        )
        scalars = (
            ranks.agg(F.sum("r").alias("total"))
            .crossJoin(
                F.broadcast(
                    contrib.agg(
                        F.coalesce(F.sum("inbound"), F.lit(0)).alias("carried")
                    )
                )
            )
            .select(
                F.expr(f"(total - carried) div {n_nodes}").alias("share")
            )
        )
        nxt = (
            ranks.select("node")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(scalars))
            .select(
                "node",
                F.expr(
                    f"({RANK_SCALE}L * {100 - damping_pct} + "
                    f"{damping_pct} * (coalesce(inbound, 0L) + share)) "
                    "div 100"
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
        # previous checkpoints' block storage is reclaimed by Spark's
        # ContextCleaner once the old frame is unreferenced (DataFrame
        # .unpersist() does not apply to checkpoint storage)
        ranks = nxt

    out = ranks.select(
        "node",
        F.col("r").alias("rank_units"),
        F.round(F.col("r").cast("double") / F.lit(float(RANK_SCALE)), 6).alias(
            "rank"
        ),
    )
    e.unpersist()
    return out
