"""Sampling primitives for training-data pipelines.

All samplers here are LAZY plans — no count/collect at build time. At
100 TB a sampler that runs driver-side actions to size itself executes the
full scan twice; these derive their per-stratum fractions inside the plan
(lazy aggregate + broadcast join), so one run samples and sizes in a single
pass over the data.

Determinism: like ``DataFrame.sample``, ``F.rand(seed)`` draws a seeded
per-partition stream — identical results for identical partitioning, which
is the strongest guarantee any distributed Bernoulli sampler gives
(tests/test_sample.py pins it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample_balanced(
    df: DataFrame,
    label_col: str = "label",
    *,
    seed: int = 42,
    cap: float = 1.0,
    on: list[str] | None = None,
) -> DataFrame:
    """Class-balanced downsampling: every stratum is Bernoulli-sampled at
    fraction ``min_class_count / stratum_count`` (capped at ``cap``), so all
    labels end up with ~equal expected counts — the standard rebalancing
    step before training on skewed data.

    Fully lazy: per-label counts are a lazy aggregate; the (tiny) fraction
    table broadcast-joins back onto the rows; the filter is a seeded
    draw. No driver-side action, one data pass, no shuffle of the
    fact table (broadcast hash join on the label).

    The draw: with ``on`` (a key column list), membership is the
    CONTENT-KEYED xxhash64 bucket test shared with ``hash_sample`` —
    reproducible across partition layouts, cluster sizes and re-runs,
    the form to use at scale. Without ``on``, a seeded ``F.rand`` stream
    (partition-layout-stable only) is kept for API parity with
    ``DataFrame.sample``.

    NULL labels are excluded up front: the equi-join could never match
    them anyway (they'd silently vanish), and counting a NULL stratum
    would let a class that cannot appear in the output drag the min-count
    floor down and undersample every real class.
    """
    df = df.where(F.col(label_col).isNotNull())
    counts = df.groupBy(label_col).agg(F.count("*").alias("_n_l"))
    floor = counts.agg(F.min("_n_l").alias("_t"))
    frac = counts.crossJoin(floor).select(
        label_col,
        F.least(F.lit(cap), F.col("_t") / F.col("_n_l")).alias("_frac"),
    )
    draw = (
        (_hash_bucket(on, seed) / F.lit(1_000_000.0))
        if on
        else F.rand(seed)
    )
    return (
        df.join(F.broadcast(frac), label_col)
        .where(draw < F.col("_frac"))
        .drop("_frac")
    )


def stratified_sample_by(
    df: DataFrame,
    label_col: str,
    fractions: dict,
    *,
    seed: int = 42,
) -> DataFrame:
    """Explicit per-stratum fractions as a lazy plan (``sampleBy`` twin
    without its eager key handling): the fractions dict folds into the plan
    as a literal map lookup. Strata absent from ``fractions`` are dropped,
    matching ``DataFrame.sampleBy`` semantics."""
    m = F.create_map(
        *[x for k, v in fractions.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    frac = m[F.col(label_col)]
    return df.where(frac.isNotNull() & (F.rand(seed) < frac))


def _hash_bucket(on: list[str], seed: int):
    """The shared bucket expression: hash_sample membership and
    hash_split routing MUST stay bit-identical (a sampled row keeps a
    stable fate under any split of the same keys+seed)."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in on], F.lit(seed)), F.lit(1_000_000)
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    on: list[str],
    *,
    seed: int = 42,
) -> DataFrame:
    """Content-keyed deterministic sampling: a row's inclusion depends only
    on its key bytes and the seed (xxhash64 bucket < fraction), NOT on the
    partition layout — so the sample is reproducible across cluster sizes,
    re-partitions and re-runs, and any row keeps a stable fate when the
    table is appended to. This is the reproducible form for train/test
    splits at 100 TB; ``F.rand(seed)``'s per-partition stream (above) is
    only stable for a fixed partitioning."""
    return df.where(_hash_bucket(on, seed) < int(fraction * 1_000_000))


def hash_split(
    df: DataFrame,
    weights: list[float],
    on: list[str],
    *,
    seed: int = 42,
) -> list[DataFrame]:
    """Disjoint, exhaustive train/val/test split by content hash: row goes
    to split i iff its hash bucket falls in [cum_i, cum_{i+1}) of the
    normalized weights. Same determinism guarantees as hash_sample; the
    splits are provably disjoint and cover the input (same hash expression,
    adjacent half-open ranges)."""
    if not weights or any(w <= 0 for w in weights):
        raise ValueError(
            f"weights must be non-empty and strictly positive, got {weights}"
        )
    total = float(sum(weights))
    bounds = [0.0]
    for w in weights:
        bounds.append(bounds[-1] + w / total)
    h = _hash_bucket(on, seed)
    out = []
    for i in range(len(weights)):
        lo = int(bounds[i] * 1_000_000)
        hi = int(bounds[i + 1] * 1_000_000) if i < len(weights) - 1 else 1_000_000
        if lo == hi:
            # integer-truncated bucket bounds resolve to 1e-6 of the
            # total: a smaller weight passes the positivity check above
            # yet would yield a silently-empty split
            raise ValueError(
                f"weight {weights[i]} is below the 1e-6 bucket resolution "
                f"(split {i} would be empty); use coarser weights"
            )
        out.append(df.where((h >= lo) & (h < hi)))
    return out


def grouped_cap_sample(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    on: list[str],
    *,
    key=None,
    rank_col: str | None = None,
) -> DataFrame:
    """Per-group cap: keep the ``n`` rows with the smallest content key in
    each group — the domain-capping step of corpus curation ("at most N
    documents per source/domain"), made deterministic: membership is a
    pure function of row content (default key: md5 over the ``on``
    columns), never of partition layout or arrival order, so the capped
    corpus replays bit-identically anywhere and any row keeps a stable
    fate under appends of OTHER keys.

    Scale shape — two-stage exact top-n (per-group min-n is
    distributive, like global TakeOrdered):

    1. per-PARTITION per-group top-n via one Arrow pass whose running
       prune keeps at most groups×n rows in memory per task. Output is
       bounded by partitions × groups_in_partition × n — candidate-sized.
    2. a row_number window over just those candidates picks the final n.

    A direct window over the full table (the textbook form, and what the
    SQL oracle twin runs) shuffles EVERY row to its group's reducer and
    sorts there — one hot domain with 30% of a 100 TB corpus becomes one
    task sorting 30 TB. Stage 1 caps what the exchange carries regardless
    of group skew. Equality with the direct window is pinned in
    tests/test_sample.py.

    ``key`` overrides the ranking expression (any deterministic column);
    ``rank_col`` additionally emits the within-group rank (1-based).
    NULL groups are real groups (kept as their own stratum — pandas
    ``dropna=False`` in stage 1 to match the window's NULL partition).

    The default key NULL-encodes each column before hashing (NULL →
    ``\\x00``, value → ``\\x01`` + string) — a bare ``concat_ws`` silently
    SKIPS NULL columns, so ('x', NULL) and (NULL, 'x') would collide onto
    one md5 and a NULL-keyed row's rank would depend on which colliding
    rows happen to be present (round-4 review). SQL-twin form:
    ``md5(chr(1) || CAST(c AS VARCHAR))`` per non-null column.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if not on:
        raise ValueError("grouped_cap_sample requires key columns (on)")
    if key is None:
        key = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.when(F.col(c).isNull(), F.lit("\x00")).otherwise(
                        F.concat(F.lit("\x01"), F.col(c).cast("string"))
                    )
                    for c in on
                ],
            )
        )
    import pandas as pd  # deferred: Arrow path only

    work = df.withColumn("_gk", key)
    order_cols = ["_gk", *on]

    def prune(batches):
        acc = None
        for pdf in batches:
            if pdf.empty:
                continue
            cur = pdf if acc is None else pd.concat([acc, pdf])
            # na_position='first' mirrors Spark's ASC NULLS FIRST: a NULL
            # custom key (or NULL tie-break column) must survive stage 1
            # exactly when the stage-2 window would rank it on top —
            # pandas' default NaN-last would prune the window's true
            # top-n (round-4 review)
            cur = cur.sort_values(
                order_cols, kind="mergesort", na_position="first"
            )
            acc = cur.groupby(group_cols, sort=False, dropna=False).head(n)
        if acc is not None and not acc.empty:
            yield acc

    cand = work.mapInPandas(prune, work.schema)
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    ranked = cand.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= n
    )
    if rank_col is not None:
        ranked = ranked.withColumn(rank_col, F.col("_rn"))
    return ranked.drop("_gk", "_rn")


def weighted_hash_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    on: list[str],
    *,
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling without replacement, hash-deterministic: the
    Efraimidis–Spirakis A-ES scheme. Each row draws a content-keyed
    uniform ``u`` (full-range xxhash64 of the same (keys, seed) input as
    ``hash_sample``, offset so u is never exactly 0 or 1) and scores
    ``u^(1/w)``; the ``k`` largest
    scores ARE a weighted sample without replacement — inclusion odds
    proportional to weight, exactly (Efraimidis & Spirakis 2006).

    Scale shape: the score is a narrow column expression; selection is
    ``orderBy(score).limit(k)`` → TakeOrderedAndProject (per-partition
    top-k then a k-row merge on one reducer — no global sort shuffle).
    Determinism: membership is a pure function of key bytes + seed +
    weight, independent of partition layout and session confs, so the
    draw replays bit-identically anywhere (unlike rand-stream samplers).

    Rows with NULL or non-positive weight are excluded (they have no
    defined inclusion probability). The uniform ``u`` uses the FULL
    xxhash64 range (~2^53 distinct doubles after the cast), not the
    1e6-bucket family of ``hash_sample``: A-ES needs a (near-)continuous
    uniform — at corpus scale a 1e6-quantized u collides constantly and
    the orderBy tie-break would resolve those collisions by ascending
    key, silently biasing the draw toward small keys (round-4 review).
    Residual ties at 2^-53 are broken on the key columns to keep the
    result a function of content alone.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not on:
        raise ValueError("weighted_hash_sample requires key columns (on)")
    # map int64 → (0, 1): (h + 2^63 + 0.5) / 2^64, clamped below 1 —
    # for h within ~1024 of int64 max the double rounding lands on
    # exactly 1.0 (u=1 ⇒ score 1 regardless of weight, breaking the
    # A-ES inclusion guarantee for that row; round-4 review, verified
    # numerically)
    h = F.xxhash64(*[F.col(c) for c in on], F.lit(seed)).cast("double")
    u = F.least(
        (h + F.lit(9.2233720368547758e18) + F.lit(0.5))
        / F.lit(1.8446744073709552e19),
        F.lit(1.0 - 2.0**-53),
    )
    w = F.col(weight_col).cast("double")
    scored = df.where(w.isNotNull() & (w > 0)).withColumn(
        "_aes_score", F.pow(u, F.lit(1.0) / w)
    )
    return (
        scored.orderBy(
            F.col("_aes_score").desc(), *[F.col(c) for c in on]
        )
        .limit(k)
        .drop("_aes_score")
    )


def split_bounds_hex(weights: dict[str, float], *, digits: int = 12) -> list[tuple[str, str]]:
    """Cumulative-weight thresholds as fixed-width lowercase hex strings —
    the split routing used by :func:`cluster_aware_split`. Returned as
    ``[(split_name, upper_bound_hex), ...]`` in declaration order; a row
    whose key prefix sorts below a bound (and not below the previous one)
    lands in that split. Hex-string comparison is identical in Spark and
    DuckDB, so the same thresholds replay in the SQL oracle twin without
    any hex→int conversion (DuckDB has no xxhash64/conv)."""
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError(
            f"weights must be non-empty and strictly positive, got {weights}"
        )
    total = float(sum(weights.values()))
    space = 16**digits
    out: list[tuple[str, str]] = []
    cum = 0.0
    prev = 0
    for name, w in weights.items():
        cum += w / total
        bound = space if cum > 1 - 1e-12 else int(cum * space)
        if bound <= prev:
            raise ValueError(
                f"weight {w} for split {name!r} is below the hex-bucket "
                f"resolution (16^-{digits}); use coarser weights"
            )
        # the final bound must sort ABOVE every possible hex key ('g' >
        # 'f' lexicographically), making the ranges exhaustive
        hex_bound = "g" * digits if bound >= space else format(bound, f"0{digits}x")
        out.append((name, hex_bound))
        prev = bound
    return out


def cluster_aware_split(
    df: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Leakage-free train/val/test split: near-duplicate CLUSTERS are the
    unit of assignment, so two near-dup documents can never straddle a
    split boundary — the standard guard against test-set contamination
    through paraphrases/templates that a plain row-hash split
    (:func:`hash_split`) cannot give. Input ``pairs`` is any near-dup
    pair source (MinHash, SimHash, embedding-cosine, substring spans).

    Returns ``(id_col, cluster_key, split)`` for every input row:
    ``cluster_key`` is the cluster's canonical (min) id — its own id for
    singletons — and ``split`` is routed by an md5 content hash of
    ``seed:cluster_key``, compared as a hex-string prefix against the
    cumulative-weight thresholds of :func:`split_bounds_hex`. Membership
    is a pure function of content: reproducible across partition
    layouts, cluster sizes and re-runs, and a document keeps its split
    when unrelated documents are appended (only a NEW near-dup edge can
    re-home a cluster — which is exactly the semantics you want).

    Scale shape: clustering is min-label propagation over the
    candidate-sized pair set (iterative BUILD work, like the ANN index
    fits — not query-path); the assignment itself is one id-keyed left
    join of labels onto the corpus ids plus a stateless hash projection.
    The md5 (not xxhash64) keying is deliberate: it replays bit-for-bit
    in the DuckDB oracle twin via a recursive-CTE connected components.
    """
    from .dedup import dedup_clusters

    bounds = split_bounds_hex(weights)
    clusters = dedup_clusters(pairs, id_a=id_a, id_b=id_b, max_iter=max_iter)
    base = df.select(F.col(id_col)).join(
        clusters.withColumnRenamed("doc_id", id_col), id_col, "left"
    )
    canonical = F.coalesce(F.col("cluster_id"), F.col(id_col))
    key_hex = F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), canonical.cast("string"))), 1, 12
    )
    # first-match-wins CASE chain: the smallest bound is tested first
    split = F.lit(bounds[-1][0])
    for name, bound in reversed(bounds[:-1]):
        split = F.when(key_hex < F.lit(bound), name).otherwise(split)
    return base.select(
        F.col(id_col),
        canonical.cast("long").alias("cluster_key"),
        split.alias("split"),
    )
