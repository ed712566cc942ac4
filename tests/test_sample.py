"""Sampling primitives: seed determinism and rate tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_similarity_search_spark.sources.tables import load_table


def test_uniform_sample_deterministic_and_sized(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    a = li.sample(fraction=0.1, seed=7).count()
    b = li.sample(fraction=0.1, seed=7).count()
    assert a == b  # same seed + same partitioning -> identical sample
    n = li.count()
    assert 0.05 * n < a < 0.15 * n


def test_balanced_sample_equalizes_classes(spark, sf_dir):
    """stratified_sample_balanced: every label's expected sample size is the
    min class count; observed counts land within Bernoulli tolerance, and
    the whole thing is one lazy plan (no build-time action)."""
    from vectordb_similarity_search_spark.operators.sampling import (
        stratified_sample_balanced,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = {r["label"]: r["count"] for r in emb.groupBy("label").count().collect()}
    floor = min(base.values())
    got = {
        r["label"]: r["count"]
        for r in stratified_sample_balanced(emb, "label", seed=7)
        .groupBy("label")
        .count()
        .collect()
    }
    for lbl, n in got.items():
        assert abs(n - floor) < max(0.5 * floor, 10), (lbl, n, floor)


def test_stratified_sample_by_lazy_matches_rates(spark, sf_dir):
    """stratified_sample_by: literal-map fractions, absent strata dropped."""
    from vectordb_similarity_search_spark.operators.sampling import (
        stratified_sample_by,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    labels = sorted(r[0] for r in emb.select("label").distinct().collect())
    keep = {labels[0]: 0.9, labels[1]: 0.1}
    got = (
        stratified_sample_by(emb, "label", keep, seed=11)
        .groupBy("label").count().collect()
    )
    base = {r["label"]: r["count"] for r in emb.groupBy("label").count().collect()}
    seen = {r["label"] for r in got}
    assert seen <= set(keep)  # absent strata dropped
    for r in got:
        rate = r["count"] / base[r["label"]]
        assert abs(rate - keep[r["label"]]) < 0.25


def test_stratified_sample_rates(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    labels = [r[0] for r in emb.select("label").distinct().collect()]
    frac = {l: (0.8 if l == labels[0] else 0.2) for l in labels}
    got = (
        emb.sampleBy("label", frac, seed=11)
        .groupBy("label").count().collect()
    )
    base = {r["label"]: r["count"] for r in emb.groupBy("label").count().collect()}
    for r in got:
        rate = r["count"] / base[r["label"]]
        assert abs(rate - frac[r["label"]]) < 0.25  # tolerance at small n


def test_balanced_sampler_ignores_null_stratum(spark):
    """A single NULL-label row must not set the min-class floor (it can
    never appear in the output) nor crash the sampler."""
    from vectordb_similarity_search_spark.operators.sampling import (
        stratified_sample_balanced,
    )

    import pyspark.sql.functions as F

    rows = [(i, "a") for i in range(400)] + [(i, "b") for i in range(400, 600)]
    rows.append((999, None))
    df = spark.createDataFrame(rows, "id long, label string")
    got = stratified_sample_balanced(df, "label", seed=7)
    counts = {r.label: r.c for r in got.groupBy("label").agg(
        F.count("*").alias("c")).collect()}
    assert None not in counts
    # floor is the b-count (200), NOT 1: class a downsampled to ~200
    assert 120 <= counts.get("a", 0) <= 280
    assert counts.get("b", 0) == 200


def test_hash_sample_partition_independent(spark, sf_dir):
    """The content-keyed sample is identical no matter how the input is
    partitioned — the property rand(seed) sampling cannot give."""
    from vectordb_similarity_search_spark.operators.sampling import hash_sample

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    a = {
        (r[0], r[1])
        for r in hash_sample(li, 0.1, ["l_orderkey", "l_linenumber"]).collect()
    }
    b = {
        (r[0], r[1])
        for r in hash_sample(
            li.repartition(17), 0.1, ["l_orderkey", "l_linenumber"]
        ).collect()
    }
    assert a == b and len(a) > 0
    n = li.count()
    assert 0.05 * n < len(a) < 0.15 * n


def test_hash_split_disjoint_and_exhaustive(spark, sf_dir):
    from vectordb_similarity_search_spark.operators.sampling import hash_split

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    n = li.count()
    splits = hash_split(li, [0.8, 0.1, 0.1], ["l_orderkey", "l_linenumber"])
    counts = [s.count() for s in splits]
    assert sum(counts) == n  # exhaustive + disjoint by construction
    assert 0.7 * n < counts[0] < 0.9 * n
    # a key's fate is stable: re-evaluating yields the same membership
    first = {tuple(r) for r in splits[0].limit(50).collect()}
    again = {tuple(r) for r in splits[0].collect()}
    assert first <= again


def test_hash_split_rejects_bad_weights(spark):
    import pytest as _pytest

    from vectordb_similarity_search_spark.operators.sampling import hash_split

    df = spark.range(10).withColumnRenamed("id", "k")
    for bad in ([], [0.5, 0.0], [0.5, -0.2, 0.7]):
        with _pytest.raises(ValueError):
            hash_split(df, bad, ["k"])


def test_hash_split_rejects_sub_resolution_weight(spark):
    """A strictly-positive weight below the 1e-6 bucket resolution would
    integer-truncate to an empty range — raise instead of silently
    returning an empty split (review fix)."""
    import pytest as _pytest

    from vectordb_similarity_search_spark.operators.sampling import hash_split

    df = spark.range(10).withColumnRenamed("id", "k")
    with _pytest.raises(ValueError, match="resolution"):
        hash_split(df, [1e-8, 1.0], ["k"])
    # at exactly representable weights nothing changes
    assert len(hash_split(df, [0.5, 0.5], ["k"])) == 2


def test_balanced_sample_hashed_is_partition_independent(spark, sf_dir):
    """With ``on=``, the balanced sampler's membership is a content
    function: identical under any repartitioning, and still ~balanced."""
    from vectordb_similarity_search_spark.operators.sampling import (
        stratified_sample_balanced,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    a = {
        r[0]
        for r in stratified_sample_balanced(
            emb, "label", seed=7, on=["vec_id"]
        ).collect()
    }
    b = {
        r[0]
        for r in stratified_sample_balanced(
            emb.repartition(13), "label", seed=7, on=["vec_id"]
        ).collect()
    }
    assert a == b and len(a) > 0
    base = {r["label"]: r["count"] for r in emb.groupBy("label").count().collect()}
    floor = min(base.values())
    got = {
        r["label"]: r["count"]
        for r in stratified_sample_balanced(emb, "label", seed=7, on=["vec_id"])
        .groupBy("label")
        .count()
        .collect()
    }
    for lbl, n in got.items():
        assert abs(n - floor) < max(0.5 * floor, 10), (lbl, n, floor)


def test_weighted_hash_sample_layout_independent(spark, sf_dir):
    """A-ES membership is a pure function of content: identical sample
    under any repartitioning, exactly k rows, no invalid-weight rows."""
    from vectordb_similarity_search_spark.operators.sampling import (
        weighted_hash_sample,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    a = [r[0] for r in weighted_hash_sample(o, 25, "o_totalprice", ["o_orderkey"]).collect()]
    b = [
        r[0]
        for r in weighted_hash_sample(
            o.repartition(13), 25, "o_totalprice", ["o_orderkey"]
        ).collect()
    ]
    assert sorted(a) == sorted(b) and len(set(a)) == 25


def test_weighted_hash_sample_weight_semantics(spark):
    """A dominant weight is (near-)always selected at k=1; zero/NULL
    weights are never drawn."""
    import pyspark.sql.functions as F
    from vectordb_similarity_search_spark.operators.sampling import (
        weighted_hash_sample,
    )

    df = spark.range(200).select(
        F.col("id"),
        F.when(F.col("id") == 7, 1e9)
        .when(F.col("id") % 10 == 0, F.lit(None))
        .when(F.col("id") % 10 == 1, -1.0)
        .otherwise(1.0)
        .alias("w"),
    )
    # dominant weight wins across many seeds: u^(1/1e9) ~ 1 for any u
    wins = sum(
        weighted_hash_sample(df, 1, "w", ["id"], seed=s).collect()[0]["id"] == 7
        for s in range(10)
    )
    assert wins == 10
    # invalid weights excluded even with k = full table
    got = {r["id"] for r in weighted_hash_sample(df, 200, "w", ["id"]).collect()}
    assert all(i % 10 not in (0, 1) or i == 7 for i in got)


def test_weighted_hash_sample_validation(spark):
    import pytest as _pytest

    from vectordb_similarity_search_spark.operators.sampling import (
        weighted_hash_sample,
    )

    with _pytest.raises(ValueError):
        weighted_hash_sample(None, 0, "w", ["id"])
    with _pytest.raises(ValueError):
        weighted_hash_sample(None, 5, "w", [])


def test_grouped_cap_sample_matches_direct_window(spark, sf_dir):
    """Two-stage top-n == the textbook single window, under hostile
    partitioning (many small partitions; groups split across them)."""
    from pyspark.sql import Window
    from vectordb_similarity_search_spark.operators.sampling import (
        grouped_cap_sample,
    )
    from vectordb_similarity_search_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    got = grouped_cap_sample(
        docs.repartition(13), ["source"], 5, on=["doc_id"], rank_col="rank"
    )
    key = F.md5(F.concat(F.lit("\x01"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    want = (
        docs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
    )
    a = sorted(
        (r.source, r.rank, r.doc_id, r.n_chars) for r in got.collect()
    )
    b = sorted(
        (r.source, r.rank, r.doc_id, r.n_chars) for r in want.collect()
    )
    assert a == b and len(a) > 0


def test_grouped_cap_sample_keeps_null_groups(spark):
    """NULL group is a real stratum (stage 1 must not drop it — pandas
    groupby defaults to dropna=True)."""
    from vectordb_similarity_search_spark.operators.sampling import (
        grouped_cap_sample,
    )

    df = spark.createDataFrame(
        [(None, i) for i in range(10)] + [("a", i) for i in range(10, 14)],
        "g string, id int",
    )
    out = grouped_cap_sample(df.repartition(3), ["g"], 2, on=["id"]).collect()
    by_g: dict = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r.id)
    assert len(by_g.get(None, [])) == 2
    assert len(by_g.get("a", [])) == 2


def test_grouped_cap_sample_small_groups_survive_whole(spark):
    from vectordb_similarity_search_spark.operators.sampling import (
        grouped_cap_sample,
    )

    df = spark.createDataFrame(
        [("solo", 1), ("big", 2), ("big", 3), ("big", 4)], "g string, id int"
    )
    out = grouped_cap_sample(df, ["g"], 2, on=["id"]).collect()
    assert sorted(r.g for r in out) == ["big", "big", "solo"]


def test_grouped_cap_sample_validation(spark):
    import pytest as _pytest

    from vectordb_similarity_search_spark.operators.sampling import (
        grouped_cap_sample,
    )

    df = spark.createDataFrame([("a", 1)], "g string, id int")
    with _pytest.raises(ValueError, match="n must be"):
        grouped_cap_sample(df, ["g"], 0, on=["id"])
    with _pytest.raises(ValueError, match="key columns"):
        grouped_cap_sample(df, ["g"], 1, on=[])


def test_grouped_cap_sample_null_keys_do_not_collide(spark):
    """('x', NULL) and (NULL, 'x') must rank under DIFFERENT content keys
    (concat_ws alone would silently skip the NULL and collide both onto
    md5('x')) — and a NULL-keyed row's fate must be stable under appends
    of other rows."""
    from vectordb_similarity_search_spark.operators.sampling import (
        grouped_cap_sample,
    )

    df = spark.createDataFrame(
        [("g", "x", None), ("g", None, "x"), ("g", "x", "")],
        "grp string, a string, b string",
    )
    out = grouped_cap_sample(
        df, ["grp"], 3, on=["a", "b"], rank_col="rank"
    ).collect()
    # all three distinct key tuples survive with distinct ranks 1..3
    assert sorted(r.rank for r in out) == [1, 2, 3]
    ranks = {(r.a, r.b): r.rank for r in out}
    # determinism: the rank of ('x', NULL) stays put when unrelated rows
    # are appended (its content key didn't change)
    df2 = df.unionByName(
        spark.createDataFrame([("g", "zzz", "zzz")], df.schema)
    )
    out2 = grouped_cap_sample(df2, ["grp"], 4, on=["a", "b"], rank_col="rank")
    ranks2 = {(r.a, r.b): r.rank for r in out2.collect()}
    rel = sorted(ranks, key=ranks.get)
    rel2 = [t for t in sorted(ranks2, key=ranks2.get) if t in ranks]
    assert rel == rel2


def test_weighted_hash_sample_u_resolution(spark):
    """The A-ES uniform must be full-range (~2^53 values), not 1e6-bucket
    quantized: over 50k equal-weight rows a 1e6-bucket u would collide
    ~2.5k times and resolve ties by ascending key — here scores must be
    (near-)unique so selection is the hash order, not the key order."""
    from vectordb_similarity_search_spark.operators.sampling import (
        weighted_hash_sample,
    )

    df = spark.range(50_000).select(
        F.col("id"), F.lit(1.0).alias("w")
    )
    got = weighted_hash_sample(df, 500, "w", ["id"], seed=1).collect()
    ids = sorted(r.id for r in got)
    assert len(ids) == 500
    # a tie-broken-by-key draw would be heavily biased toward small ids;
    # a uniform draw's mean id sits near 25k (std ~ 645 for n=500)
    mean = sum(ids) / len(ids)
    assert 22_000 < mean < 28_000, mean


def test_grouped_cap_sample_custom_key_with_nulls_matches_window(spark):
    """A custom ranking key with NULLs: stage-1 pandas pruning must use
    NULLS-FIRST like the stage-2 Spark window (pandas defaults to
    NaN-last, which would prune the window's true top-n; review fix)."""
    from pyspark.sql import Window
    from vectordb_similarity_search_spark.operators.sampling import (
        grouped_cap_sample,
    )

    rows = [("g", i, None if i % 3 == 0 else float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "grp string, id int, priority double")
    got = sorted(
        (r.grp, r.id)
        for r in grouped_cap_sample(
            df.repartition(5), ["grp"], 4, on=["id"], key=F.col("priority")
        ).collect()
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("priority").asc(), F.col("id").asc()
    )
    want = sorted(
        (r.grp, r.id)
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 4)
        .collect()
    )
    assert got == want
    # NULL priorities rank first under ASC NULLS FIRST, so all four picks
    # must be NULL-priority rows
    assert all(i % 3 == 0 for _, i in got)
