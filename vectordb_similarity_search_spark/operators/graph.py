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


def knn_graph(
    df: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """EXACT directed cosine k-NN graph at scale: block-grid BLAS top-k.

    The all-pairs sibling of a single-query search — the structure
    kNN-graph clustering, mutual-neighbor dedup, and graph-ANN index
    builds all start from. Returns one row per (src, dst) directed edge:
    ``(src, dst, cosine double, rank int)`` with rank 1..k per src
    (cosine desc, dst-id asc tie-break). Self-edges are excluded;
    zero-norm vectors (cosine undefined) contribute no edges in either
    direction, mirroring ``dedup.embedding_neardup_blocked``.

    Shape (the same block-grid as embedding_neardup_blocked, but emitting
    per-source TOP-K instead of threshold survivors):

    1. each row gets a stable block ``xxhash64(id) mod n_blocks`` and is
       replicated to every grid cell its block touches — shuffle volume
       N·n_blocks (id, vector) rows, never N² pairs;
    2. per cell, ONE float64 BLAS matmul scores the |A|×|B| slab and each
       side keeps only its local top-k over the other side — ≤ 2·k·rows
       out per cell, so the rank exchange carries O(N·n_blocks·k) rows;
    3. a global per-src rank window over the reduced candidates picks the
       true top-k (every cell's local top-k is a superset contributor of
       the global top-k, so phase 3 sees all true winners).

    Exactness & oracle bit-parity: BLAS scores only SCREEN. The local cut
    keeps everything within 1e-9 of the cell's k-th best BLAS score (ulp
    slack: BLAS association differs from the sequential fold in the last
    bits), and survivors are rescored as dot/(na·nb) accumulated strictly
    left-to-right over dims — the JVM-HOF/DuckDB association — so the
    final rank and round-6 scores match a cross-join SQL twin bit-for-bit
    (property-pinned in tests/test_graph.py). Zero-norm rows are removed
    from both slab sides BEFORE the cut — a zero vector's 0.0 screening
    score must never occupy a top-k slot and evict a true
    negative-cosine winner (regression-pinned).

    At 100 TB: pick n_blocks ≈ √(2·P) so a cell's two blocks fit one
    executor; compare ``topk.similarity_join_blocked`` (collects ONE side
    — right only when queries ≪ corpus; here both sides are the corpus).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ._blockgrid import grid_replicate, seq_dot

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_blocks < 1:
        raise ValueError(f"n_blocks must be >= 1, got {n_blocks}")

    id_type = df.schema[id_col].dataType
    cand_schema = T.StructType(
        [
            T.StructField("src", id_type),
            T.StructField("dst", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    grid = grid_replicate(df, id_col, vec_col, n_blocks)

    def _local_topk(
        S: np.ndarray,
        X: np.ndarray,
        norms: np.ndarray,
        src_idx: np.ndarray,
        dst_idx: np.ndarray,
        ids: np.ndarray,
        out: list,
    ) -> None:
        """Per src row of S (src_idx × dst_idx slab, zero-norm rows
        already excluded from both index sets), keep candidates within
        1e-9 of the row's k-th best screening score, exact-rescore them,
        and append (src, dst, cosine) rows. S may be a transposed view —
        np.partition copies internally either way."""
        if S.shape[1] == 0 or S.shape[0] == 0:
            return
        kth = min(k, S.shape[1])
        # np.partition is ascending — the k-th LARGEST sits at index -kth
        part = np.partition(S, S.shape[1] - kth, axis=1)[:, S.shape[1] - kth]
        keep_i, keep_j = np.nonzero(S >= (part[:, None] - 1e-9))
        gi = src_idx[keep_i]
        gj = dst_idx[keep_j]
        ok = ids[gi] != ids[gj]
        gi, gj = gi[ok], gj[ok]
        if len(gi) == 0:
            return
        cos = seq_dot(X[gi], X[gj]) / (norms[gi] * norms[gj])
        out.append(
            pd.DataFrame({"src": ids[gi], "dst": ids[gj], "cosine": cos})
        )

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=["src", "dst", "cosine"])
        ga, gb = int(pdf["_ga"].iloc[0]), int(pdf["_gb"].iloc[0])
        X = np.vstack(pdf["_v"].to_numpy())
        ids = pdf["_id"].to_numpy()
        norms = np.sqrt(seq_dot(X, X))
        nz = norms != 0.0  # cosine undefined: no edges in either direction
        safe = np.where(nz, norms, 1.0)
        U = X / safe[:, None]
        out: list = []
        if ga == gb:
            idx = np.flatnonzero(nz)
            S = U[idx] @ U[idx].T
            np.fill_diagonal(S, -np.inf)  # exclude self before the cut
            _local_topk(S, X, norms, idx, idx, ids, out)
        else:
            blk = pdf["_blk"].to_numpy()
            A_idx = np.flatnonzero((blk == ga) & nz)
            B_idx = np.flatnonzero((blk == gb) & nz)
            S = U[A_idx] @ U[B_idx].T
            _local_topk(S, X, norms, A_idx, B_idx, ids, out)
            _local_topk(S.T, X, norms, B_idx, A_idx, ids, out)
        if not out:
            return pd.DataFrame(columns=["src", "dst", "cosine"])
        return pd.concat(out, ignore_index=True)

    cands = grid.groupBy("_ga", "_gb").applyInPandas(score_cell, cand_schema)
    w = Window.partitionBy("src").orderBy(
        F.col("cosine").desc(), F.col("dst").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def triangle_stats(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Exact triangle count + global clustering coefficient over an
    undirected edge list (canonical form: ``src < dst``, deduplicated —
    the caller's contract).

    Algorithm: degree-ordered orientation (the MapReduce triangle scheme of
    Suri & Vassilvitskii, WWW'11 — 'the curse of the last reducer'). Every
    edge is oriented from its lower-(degree, id) endpoint to the higher
    one, so each node's out-degree is O(sqrt(m)) regardless of how skewed
    the raw degree distribution is; wedges are generated only from the two
    out-edges of their unique lowest-ordered apex, which makes the wedge
    exchange Sum C(outdeg, 2) = O(m^1.5) worst-case instead of
    Sum C(deg, 2) (quadratic in the hottest key). Each triangle is counted
    exactly once: its apex in the total order is the unique node with two
    out-edges into the other two, and the closing edge is matched in
    oriented form.

    Returns ONE row: n_nodes, n_edges, n_triangles, n_wedges (undirected
    open+closed wedge count, Sum C(deg, 2)), clustering_coeff
    (3*triangles/wedges — exact-integer inputs, so the double is
    bit-stable cross-engine). All counts are exact integers.

    Scale shape: degree aggregate (one exchange over 2m endpoint rows,
    map-side combined) → two edge⋈degree joins (edge-sized) → apex
    self-join on the oriented source (bounded by orientation) → closing
    semi-join (wedge-sized vs m). The degree exchange is shared between
    the orientation joins and the wedge aggregate via Spark's exchange
    reuse. Nothing is collected driver-side.
    """
    u, v = F.col(src), F.col(dst)
    e = edges.select(u.alias("u"), v.alias("v"))
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    # Orient by (degree, id): lower endpoint -> higher endpoint. Heads keep
    # their (degree, id) key so wedge pairs can be emitted pre-ordered for
    # the closing lookup.
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    o1 = oriented.select("a", F.col("b").alias("b1"), F.col("db").alias("db1"))
    o2 = oriented.select("a", F.col("b").alias("b2"), F.col("db").alias("db2"))
    # Emit each apex's unordered head pair once, pre-ordered by the SAME
    # (degree, id) total order the orientation uses — the closing edge, if
    # present, is oriented exactly (x -> y) under that order.
    head_first = (F.col("db1") < F.col("db2")) | (
        (F.col("db1") == F.col("db2")) & (F.col("b1") < F.col("b2"))
    )
    wedges = (
        o1.join(o2, "a")
        .filter(head_first)
        .select(F.col("b1").alias("x"), F.col("b2").alias("y"))
    )
    closing = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    # Inner join is a multiplicity-correct semi-join here: edges are
    # deduplicated, so each (x, y) appears at most once on the closing side,
    # while distinct apexes sharing a head pair are distinct triangles.
    tri = wedges.join(closing, ["x", "y"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    deg_stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("(d * (d - 1)) div 2")).alias("n_wedges"),
        F.max("d").cast("long").alias("max_degree"),
    )
    edge_stats = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        deg_stats.crossJoin(F.broadcast(edge_stats))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.coalesce("n_wedges", F.lit(0).cast("long")).alias("n_wedges"),
            "max_degree",
            # NULL (not NaN) on a wedge-free graph — div-by-zero house
            # discipline, and the oracle's 0/0 is NULL in DuckDB.
            F.when(
                F.col("n_wedges") > 0,
                F.round(
                    F.lit(3) * F.col("n_triangles").cast("double")
                    / F.col("n_wedges").cast("double"),
                    6,
                ),
            ).alias("clustering_coeff"),
        )
    )
