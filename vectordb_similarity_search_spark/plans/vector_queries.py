"""Vector-surface queries (SURVEY.md §2.4): the reference's core capability.

Covers V4 (cosine 1×N), V5/V6 (two-phase top-k), J2 (similarity join),
V1 (z-score fit), V7 (embedding variance), A1-A5 (stats over hits,
reference :366-407), S5 (store-time stats, :288-292).

Every oracle twin computes in DOUBLE after an explicit cast (matching the
Spark kernels in ``functions/vector.py``) and rounds scores to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.topk import knn, similarity_join
from .catalog import query, t


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """Fetch the query vector (a query *parameter*, like the reference's
    query patient dict, similarity_search.py:613-634 — one driver-side row,
    not a data-path collect)."""
    row = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .head()
    )
    return list(row[0])


@query(
    "v_knn_cosine",
    oracle="""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), scored AS (
  SELECT e.vec_id, e.label,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), (SELECT qv FROM q)) AS s
  FROM embeddings e
  WHERE e.vec_id <> 0
)
SELECT vec_id, label, (round(s, 6) + 0) AS score
FROM scored ORDER BY s DESC, vec_id LIMIT 10
""",
)
def v_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbours of vec 0 — reference E2 search path
    (similarity_search.py:300-305) as scan → score projection →
    TakeOrderedAndProject."""
    qv = _query_vec(spark, sf_dir, 0)
    corpus = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return knn(corpus, qv, k=10).select(
        "vec_id", "label", F.round("score", 6).alias("score")
    )


@query(
    "v_knn_l2",
    oracle="""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), scored AS (
  SELECT e.vec_id, e.label,
         list_distance(CAST(e.embedding AS DOUBLE[]), (SELECT qv FROM q)) AS d
  FROM embeddings e
  WHERE e.vec_id <> 0
)
SELECT vec_id, label, (round(d, 6) + 0) AS dist
FROM scored ORDER BY d ASC, vec_id LIMIT 10
""",
)
def v_knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 euclidean neighbours of vec 0 (metric variant of V4/V5)."""
    qv = _query_vec(spark, sf_dir, 0)
    corpus = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return knn(corpus, qv, k=10, metric="l2", score_col="dist").select(
        "vec_id", "label", F.round("dist", 6).alias("dist")
    )


@query(
    "v_sim_join_topk",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS s
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, s,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, (round(s, 6) + 0) AS score, rank
FROM ranked WHERE rank <= 3
""",
)
def v_sim_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N×M similarity join (J2): top-3 neighbours for each of 5 query
    vectors, self-pairs excluded. Broadcast queries + rank window."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = similarity_join(
        queries,
        emb.select("vec_id", "embedding"),
        k=3,
        pair_filter=F.col("vec_id") != F.col("query_id"),
    )
    return res.select(
        "query_id", "vec_id", F.round("score", 6).alias("score"), "rank"
    )


@query(
    "v_query_cohort_stats",
    oracle="""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), hits AS (
  SELECT e.vec_id, e.label,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), (SELECT qv FROM q)) AS s
  FROM embeddings e
  WHERE e.vec_id <> 0
  ORDER BY s DESC, e.vec_id LIMIT 10
)
SELECT label,
       count(*) AS n_hits,
       (round(avg(s), 6) + 0) AS avg_score,
       (round(min(s), 6) + 0) AS min_score,
       (round(max(s), 6) + 0) AS max_score
FROM hits GROUP BY label
""",
)
def v_query_cohort_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outcome stats over the top-k hit cohort — the reference's
    transplant-statistics bundle over merged results
    (similarity_search.py:366-407, A1-A5) with label as the outcome."""
    qv = _query_vec(spark, sf_dir, 0)
    corpus = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    hits = knn(corpus, qv, k=10)
    return hits.groupBy("label").agg(
        F.count("*").alias("n_hits"),
        F.round(F.avg("score"), 6).alias("avg_score"),
        F.round(F.min("score"), 6).alias("min_score"),
        F.round(F.max("score"), 6).alias("max_score"),
    )


@query(
    "v_centroids",
    oracle="""
SELECT label, pos, (round(avg(c), 6) + 0) AS centroid
FROM (
  SELECT label,
         CAST(unnest(embedding) AS DOUBLE) AS c,
         CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos
  FROM embeddings
)
GROUP BY label, pos
""",
)
def v_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components — the partial-aggregate-friendly way to
    compute class prototypes (map-side combine on (label,pos); shuffle is
    |labels|·dim rows, independent of corpus size)."""
    emb = t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .select("label", (F.col("pos") + 1).cast("int").alias("pos"), "col")
        .groupBy("label", "pos")
        .agg(F.round(F.avg("col"), 6).alias("centroid"))
    )


@query(
    "v_embedding_variance",
    oracle="""
SELECT count(*) AS n_components,
       (round(avg(c), 6) + 0) AS mean_component,
       (round(var_samp(c), 6) + 0) AS var_component
FROM (SELECT CAST(unnest(embedding) AS DOUBLE) AS c FROM embeddings)
""",
)
def v_embedding_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality scalar — reference V7 (`torch.var` over the whole
    matrix, similarity_search.py:255-260; torch.var is sample variance)."""
    emb = t(spark, sf_dir, "embeddings")
    return (
        emb.select(F.explode(F.col("embedding").cast("array<double>")).alias("c"))
        .agg(
            F.count("*").alias("n_components"),
            F.round(F.avg("c"), 6).alias("mean_component"),
            F.round(F.var_samp("c"), 6).alias("var_component"),
        )
    )


@query(
    "v_zscore_fit",
    oracle="""
SELECT pos, (round(avg(c), 6) + 0) AS mu, (round(stddev_pop(c), 6) + 0) AS sigma
FROM (
  SELECT CAST(unnest(embedding) AS DOUBLE) AS c,
         CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos
  FROM embeddings
)
GROUP BY pos
""",
)
def v_zscore_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit of the z-score normalizer (V1: population std, eps added at apply
    time — similarity_search.py:198). Computing the stats as a tiny aggregate
    and broadcasting them back is the train/serve-skew-free design the
    reference lacks (its query path re-normalizes per row, :576)."""
    emb = t(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode(F.col("embedding").cast("array<double>")))
        .select((F.col("pos") + 1).cast("int").alias("pos"), "col")
        .groupBy("pos")
        .agg(
            F.round(F.avg("col"), 6).alias("mu"),
            F.round(F.stddev_pop("col"), 6).alias("sigma"),
        )
    )


@query(
    "v_store_stats",
    oracle="""
SELECT label,
       count(*) AS n_vectors,
       (round(avg(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])))), 6) + 0) AS avg_norm
FROM embeddings GROUP BY label
""",
)
def v_store_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store-time statistics (reference S5, similarity_search.py:288-292):
    per-partition-key counts + mean vector norm."""
    from ..functions.vector import l2_norm

    emb = t(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.avg(l2_norm("embedding")), 6).alias("avg_norm"),
    )


@query(
    "v_dot_topk",
    oracle="""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), scored AS (
  SELECT e.vec_id, e.label,
         list_inner_product(CAST(e.embedding AS DOUBLE[]), (SELECT qv FROM q)) AS s
  FROM embeddings e WHERE e.vec_id <> 0
)
SELECT vec_id, label, (round(s, 6) + 0) AS dot_score
FROM scored ORDER BY s DESC, vec_id LIMIT 10
""",
)
def v_dot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 by raw inner product (maximum-inner-product search — the
    third metric next to cosine/L2; same two-phase top-k plan)."""
    from ..functions.vector import array_lit, dot

    qv = _query_vec(spark, sf_dir, 0)
    corpus = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    scored = corpus.withColumn("s", dot(F.col("embedding"), array_lit(qv)))
    return (
        scored.orderBy(F.col("s").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id", "label", F.round("s", 6).alias("dot_score"))
    )
