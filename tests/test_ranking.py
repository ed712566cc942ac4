"""operators/ranking.py: distributed global row_number + snake shards.

The contract under test: global_row_number produces EXACTLY the ranks a
single-window ``row_number() OVER (ORDER BY ...)`` would — while never
funneling the frame through one partition — and stays stable under
adversarial input partitioning (the determinism the t_token_shards oracle
relies on).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.ranking import (
    global_row_number,
    snake_shards,
)

from .conftest import plan_of


@pytest.fixture(scope="module")
def frame(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select("doc_id", F.size(F.split("text", r"\s+")).alias("n_tok"))


def _reference_ranks(frame, descending):
    order = [
        F.col("n_tok").desc() if descending else F.col("n_tok").asc(),
        F.col("doc_id").asc(),
    ]
    w = Window.orderBy(*order)
    return {
        r["doc_id"]: r["rn"]
        for r in frame.withColumn("rn", F.row_number().over(w)).collect()
    }


@pytest.mark.parametrize("descending", [False, True])
def test_matches_single_window_row_number(frame, descending):
    got = {
        r["doc_id"]: r["rn"]
        for r in global_row_number(
            frame,
            ["n_tok", "doc_id"],
            descending=[descending, False],
            buckets=8,
        ).collect()
    }
    assert got == _reference_ranks(frame, descending)


def test_partitioning_invariance(frame):
    base = global_row_number(
        frame, ["n_tok", "doc_id"], descending=[True, False], buckets=8
    )
    shuffled = global_row_number(
        frame.repartition(13, "doc_id"),
        ["n_tok", "doc_id"],
        descending=[True, False],
        buckets=8,
    )
    a = {r["doc_id"]: r["rn"] for r in base.collect()}
    b = {r["doc_id"]: r["rn"] for r in shuffled.collect()}
    assert a == b


def test_no_single_partition_exchange(frame):
    plan = plan_of(
        global_row_number(
            frame, ["n_tok", "doc_id"], descending=[True, False], buckets=8
        )
    )
    assert "SinglePartition" not in plan, plan


def test_heavy_ties_stay_correct(spark):
    # one value dominates: quantile bounds collapse, ties must all share a
    # bucket and ranks still match the reference
    rows = [(i, 5 if i % 10 else i) for i in range(1, 501)]
    df = spark.createDataFrame(rows, "doc_id: long, n_tok: long").repartition(7)
    got = {
        r["doc_id"]: r["rn"]
        for r in global_row_number(
            df, ["n_tok", "doc_id"], descending=[False, False], buckets=8
        ).collect()
    }
    assert got == _reference_ranks(df, descending=False)


def test_empty_and_validation(spark):
    empty = spark.createDataFrame([], "doc_id: long, n_tok: long")
    assert global_row_number(empty, ["n_tok"]).count() == 0
    with pytest.raises(ValueError):
        global_row_number(empty, [])
    with pytest.raises(ValueError):
        global_row_number(empty, ["n_tok"], descending=[True, False])
    with pytest.raises(ValueError):
        snake_shards(empty, "n_tok", "doc_id", 0)


def test_snake_shards_balance_and_cover(frame):
    n = 8
    shards = snake_shards(frame, "n_tok", "doc_id", n, buckets=8)
    per = (
        shards.groupBy("shard")
        .agg(F.count("*").alias("docs"), F.sum("n_tok").alias("tok"))
        .collect()
    )
    assert sorted(r["shard"] for r in per) == list(range(n))
    docs = [r["docs"] for r in per]
    assert max(docs) - min(docs) <= 1  # snake deals one row per block
    toks = [r["tok"] for r in per]
    # LPT-style balance: within 2% of even token mass on the fixture corpus
    assert max(toks) / (sum(toks) / n) < 1.02
    # every doc assigned exactly once
    assert shards.count() == frame.count()
    assert shards.select("doc_id").distinct().count() == frame.count()


def test_write_training_shards_layout_and_manifest(spark, sf_dir, tmp_path):
    import glob
    import json

    from vectordb_similarity_search_spark.operators.ranking import (
        write_training_shards,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", F.size(F.split("text", r"\s+")).alias("n_tok")
    )
    path = str(tmp_path / "shards")
    manifest = write_training_shards(d, path, "n_tok", "doc_id", 4)

    # exactly one parquet file per shard dir
    for k in range(4):
        files = glob.glob(f"{path}/shard={k}/*.parquet")
        assert len(files) == 1, (k, files)

    # manifest matches a read-back accounting, and the sidecar is valid
    back = spark.read.parquet(path)
    per = {
        r["shard"]: (r["rows"], r["tok"])
        for r in back.groupBy("shard")
        .agg(F.count("*").alias("rows"), F.sum("n_tok").alias("tok"))
        .collect()
    }
    assert {m["shard"]: (m["rows"], m["weight"]) for m in manifest} == per
    side = json.load(open(f"{path}/_shard_manifest.json"))
    assert side["total_rows"] == d.count()
    assert side["shards"] == manifest

    # no doc lost or duplicated, and weight mass is balanced
    assert back.select("doc_id").distinct().count() == d.count()
    toks = [m["weight"] for m in manifest]
    assert max(toks) / (sum(toks) / 4) < 1.02


@pytest.mark.parametrize("descending", [False, True])
def test_null_leading_keys_match_window_order(spark, descending):
    # NULLs sort first under asc, last under desc — the bucket assignment
    # must agree with the single-window form in both directions
    rows = [(i, None if i % 7 == 0 else (i * 37) % 101) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "doc_id: long, n_tok: long").repartition(5)
    got = {
        r["doc_id"]: r["rn"]
        for r in global_row_number(
            df, ["n_tok", "doc_id"], descending=[descending, False], buckets=8
        ).collect()
    }
    assert got == _reference_ranks(df, descending)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_random_frames_match_window_ranks(spark, data):
    """Property: on random frames — duplicate-heavy weights, NULLs, random
    bucket counts, both sort directions — global_row_number equals the
    single-window reference exactly."""
    n = data.draw(st.integers(min_value=1, max_value=120))
    weights = data.draw(
        st.lists(
            st.one_of(st.none(), st.integers(min_value=-5, max_value=8)),
            min_size=n,
            max_size=n,
        )
    )
    buckets = data.draw(st.sampled_from([2, 3, 8, 64]))
    descending = data.draw(st.booleans())
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id: long, n_tok: long").repartition(
        data.draw(st.sampled_from([1, 3, 7]))
    )
    got = {
        r["doc_id"]: r["rn"]
        for r in global_row_number(
            df,
            ["n_tok", "doc_id"],
            descending=[descending, False],
            buckets=buckets,
        ).collect()
    }
    assert got == _reference_ranks(df, descending)


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_snake_balance_bound_random_weights(spark, data):
    """Property: for ANY positive weights, each snake shard's total stays
    within two rows' worth (2x the max single weight) of the even split —
    the per-block deal hands every shard one row per block, and the
    forward/backward alternation bounds the cumulative asymmetry."""
    n = data.draw(st.integers(min_value=8, max_value=150))
    n_shards = data.draw(st.sampled_from([2, 4, 8]))
    weights = data.draw(
        st.lists(
            st.integers(min_value=1, max_value=1000), min_size=n, max_size=n
        )
    )
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id: long, n_tok: long")
    per = {
        r["shard"]: r["tok"]
        for r in snake_shards(df, "n_tok", "doc_id", n_shards, buckets=4)
        .groupBy("shard")
        .agg(F.sum("n_tok").alias("tok"))
        .collect()
    }
    even = sum(weights) / n_shards
    slack = max(weights) * 2  # one block's worth of deal asymmetry
    assert all(abs(v - even) <= slack for v in per.values()), (per, even)


# ---------------------------------------------------------------------------
# global_ntile: exact SQL-ntile semantics without the SinglePartition sort
# (the round-4 verdict's de-single-reducer order for d_novelty_curve /
# r_rfm_segments).
# ---------------------------------------------------------------------------

from vectordb_similarity_search_spark.operators.ranking import (  # noqa: E402
    global_ntile,
)


def _reference_tiles(df, k, keys, descending):
    order = [
        F.col(c).desc() if d else F.col(c).asc()
        for c, d in zip(keys, descending)
    ]
    w = Window.orderBy(*order)
    return {
        r["doc_id"]: r["t"]
        for r in df.withColumn("t", F.ntile(k).over(w)).collect()
    }


@pytest.mark.parametrize("k", [4, 10, 7])
@pytest.mark.parametrize("descending", [False, True])
def test_global_ntile_matches_window_ntile(frame, k, descending):
    got = {
        r["doc_id"]: r["tile"]
        for r in global_ntile(
            frame,
            k,
            ["n_tok", "doc_id"],
            descending=[descending, False],
            buckets=8,
        ).collect()
    }
    assert got == _reference_tiles(
        frame, k, ["n_tok", "doc_id"], [descending, False]
    )


def test_global_ntile_uneven_and_tiny(spark):
    # n not divisible by k (first n%k tiles get the extra row) and n < k
    # (each row alone in its own tile) — the two edge shapes of the SQL
    # definition
    for n, k in [(10, 4), (3, 10), (13, 5), (1, 1)]:
        df = spark.createDataFrame(
            [(i, i * 7 % 13) for i in range(1, n + 1)],
            "doc_id: long, n_tok: long",
        ).repartition(3)
        got = {
            r["doc_id"]: r["tile"]
            for r in global_ntile(
                df, k, ["n_tok", "doc_id"], buckets=4
            ).collect()
        }
        assert got == _reference_tiles(
            df, k, ["n_tok", "doc_id"], [False, False]
        )


def test_global_ntile_decimal_key_and_no_single_partition(spark):
    # decimal leading key (the r_rfm_segments spend quartile) + plan pin
    df = spark.createDataFrame(
        [(i, i * 37 % 101) for i in range(1, 201)], "doc_id: long, v: long"
    ).select("doc_id", F.col("v").cast("decimal(18,2)").alias("n_tok"))
    got = {
        r["doc_id"]: r["tile"]
        for r in global_ntile(
            df, 4, ["n_tok", "doc_id"], descending=[True, False], buckets=4
        ).collect()
    }
    assert got == _reference_tiles(
        df, 4, ["n_tok", "doc_id"], [True, False]
    )
    plan = plan_of(
        global_ntile(
            df, 4, ["n_tok", "doc_id"], descending=[True, False], buckets=4
        )
    )
    assert "SinglePartition" not in plan, plan


def test_global_ntile_validation(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id: long, n_tok: long")
    with pytest.raises(ValueError):
        global_ntile(df, 0, ["n_tok"])


def test_persist_registry_bounded_across_rebuilds(spark):
    """Rebuilding the same persisted plan N times must reuse ONE registry
    entry (the (appId, semanticHash) dedupe) — an append-list regrows
    py4j handles per rebuild even though Spark dedupes the cached data."""
    from vectordb_similarity_search_spark.operators import ranking

    ranking.release_ranking_caches()
    df = spark.range(100).selectExpr("id", "id % 7 AS k")
    before = len(ranking._PERSISTED)
    for _ in range(3):
        ranking.global_row_number(df, ["k", "id"], persist=True, buckets=4)
    assert len(ranking._PERSISTED) == before + 1
    assert ranking.release_ranking_caches() >= 1


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_random_frames_match_window_ntile(spark, data):
    """Property: on random frames — NULL-bearing duplicate-heavy keys,
    random tile/bucket counts, both directions — global_ntile equals the
    single-window ntile exactly (the SQL larger-buckets-first form)."""
    n = data.draw(st.integers(min_value=1, max_value=120))
    weights = data.draw(
        st.lists(
            st.one_of(st.none(), st.integers(min_value=-5, max_value=8)),
            min_size=n,
            max_size=n,
        )
    )
    k = data.draw(st.sampled_from([1, 2, 4, 7, 10, 150]))
    buckets = data.draw(st.sampled_from([2, 3, 8]))
    descending = data.draw(st.booleans())
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id: long, n_tok: long").repartition(
        data.draw(st.sampled_from([1, 3, 7]))
    )
    got = {
        r["doc_id"]: r["tile"]
        for r in global_ntile(
            df,
            k,
            ["n_tok", "doc_id"],
            descending=[descending, False],
            buckets=buckets,
        ).collect()
    }
    assert got == _reference_tiles(
        df, k, ["n_tok", "doc_id"], [descending, False]
    )


def test_persist_registry_collision_never_aliases(spark):
    """Round-5 ADVICE: a 32-bit semanticHash collision between two
    semantically different same-schema frames must NOT hand back the
    wrong cached DataFrame. The shared PersistRegistry confirms bucket
    hits with sameSemantics — simulate a collision by forcing both
    frames into one bucket key."""
    from vectordb_similarity_search_spark.util import PersistRegistry

    reg = PersistRegistry()
    a = spark.range(10).selectExpr("id AS k")
    b = spark.range(20).selectExpr("id AS k")  # same schema, different plan
    try:
        ra = reg.persist(a)
        # force b into a's bucket (what a real 2^-32 collision would do)
        app = spark.sparkContext.applicationId
        key_a = (app, a.semanticHash(), str(a.schema))
        forced = reg._frames.pop((app, b.semanticHash(), str(b.schema)), [])
        rb = reg.persist(b)
        reg._frames.setdefault(key_a, []).extend(
            reg._frames.pop((app, b.semanticHash(), str(b.schema)), [])
        )
        reg._frames[key_a].extend(forced)
        # lookups after the collision still resolve by plan, not by hash
        assert reg.persist(a) is ra
        got_b = None
        for cached in reg._frames[key_a]:
            if b.sameSemantics(cached):
                got_b = cached
        assert got_b is rb and rb.count() == 20 and ra.count() == 10
        # and a REBUILD of the same plan reuses the registered handle
        a2 = spark.range(10).selectExpr("id AS k")
        assert reg.persist(a2) is ra
    finally:
        reg.release()


def test_persist_registry_discard_removes_one_entry(spark):
    """discard() (the ann serving-loop hook): deregisters + unpersists
    exactly the given frame, leaves other registrations alone, and is a
    safe no-op on frames that were never registered."""
    from vectordb_similarity_search_spark.util import PersistRegistry

    reg = PersistRegistry()
    a = spark.range(10).selectExpr("id AS k")
    b = spark.range(20).selectExpr("id AS k")
    try:
        ra, rb = reg.persist(a), reg.persist(b)
        assert len(reg) == 2
        assert reg.discard(ra) is True
        assert len(reg) == 1
        assert ra.storageLevel.useMemory is False  # actually unpersisted
        # the survivor is still registered: rebuild reuses its handle
        assert reg.persist(spark.range(20).selectExpr("id AS k")) is rb
        # unregistered frame: no-op False
        assert reg.discard(spark.range(5)) is False
        # a discarded frame can be re-registered
        assert reg.persist(a) is ra
        assert len(reg) == 2
    finally:
        reg.release()


def test_adaptive_probe_interim_rounds_leave_registry(spark, tmp_path):
    """ivf_search_until_k registers ONLY the terminal round's frame in the
    serving registry: interim (insufficient-k) rounds are discarded, and a
    repeated identical call reuses the registered handle instead of
    appending — the registry stays bounded across serving loops."""
    from pyspark.sql import functions as F

    from vectordb_similarity_search_spark.operators.ann import (
        _PERSISTED_SERVE,
        ivf_fit,
        ivf_search_until_k,
        ivf_write_index,
        release_ann_caches,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 13), float(i % 7), 1.0], i % 4)
         for i in range(160)],
        "vec_id long, embedding array<double>, label int",
    )
    model = ivf_fit(emb, n_cells=8, seed=3)
    idx = str(tmp_path / "adaptidx")
    ivf_write_index(model, emb, idx)
    release_ann_caches()
    try:
        res, nprobe = ivf_search_until_k(
            spark, idx, model, [0.0, 1.0, 1.0], k=25,
            start_nprobe=1, predicate=F.col("label") == 1,
        )
        assert nprobe > 1  # the filter forces at least one escalation
        assert len(_PERSISTED_SERVE) == 1  # interim rounds discarded
        res2, nprobe2 = ivf_search_until_k(
            spark, idx, model, [0.0, 1.0, 1.0], k=25,
            start_nprobe=1, predicate=F.col("label") == 1,
        )
        assert nprobe2 == nprobe
        assert len(_PERSISTED_SERVE) == 1  # reused, not re-appended
    finally:
        release_ann_caches()


def _explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_auto_row_number_branches_bit_identical_and_routed_plan_shape(
    spark,
):
    """auto_row_number: the two branches (single window vs bucketed
    global rank) are bit-identical on a duplicate-heavy frame, and the
    routed plan carries NO SinglePartition exchange."""
    from vectordb_similarity_search_spark.operators.ranking import (
        auto_row_number,
    )

    df = spark.range(4000).selectExpr(
        "id", "CAST(id % 37 AS INT) AS k"
    )
    small = auto_row_number(df, ["k", "id"], col_name="rn",
                            max_bytes=1 << 60)
    big = auto_row_number(df, ["k", "id"], col_name="rn", max_bytes=-1)
    assert small.schema == big.schema
    assert (
        small.orderBy("id").collect() == big.orderBy("id").collect()
    )
    assert "SinglePartition" in _explain_str(small)
    assert "SinglePartition" not in _explain_str(big)


def test_global_cumsum_matches_single_window_decimals_and_nulls(spark):
    """global_cumsum == sum() OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING) exactly: decimal widening, NULL values contributing
    nothing, NULL-prefix staying NULL, descending order."""
    from pyspark.sql import Window

    from vectordb_similarity_search_spark.operators.ranking import (
        global_cumsum,
    )

    rows = [
        (i, None if i % 11 == 0 else round((i * 37 % 100) + 0.25, 2))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id long, v double").selectExpr(
        "id", "CAST(v AS DECIMAL(18,2)) AS v"
    )
    for desc in (False, True):
        order = [F.col("v").desc() if desc else F.col("v").asc(),
                 F.col("id").asc()]
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want = df.withColumn("cs", F.sum("v").over(w))
        got = global_cumsum(
            df, "v", ["v", "id"], descending=[desc, False], col_name="cs"
        )
        assert want.schema == got.schema
        assert (
            want.orderBy("id").collect() == got.orderBy("id").collect()
        )
        assert "SinglePartition" not in _explain_str(got)


def _single_partition_consumers(df) -> list[str]:
    """The operator consuming each 'Exchange SinglePartition' in the
    physical plan tree (nearest ancestor line with smaller indent)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()

    def indent(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-*"))

    out = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        for j in range(i - 1, -1, -1):
            if indent(lines[j]) < indent(line):
                out.append(lines[j].strip(" :+-*"))
                break
        else:
            out.append("<root>")
    return out


def test_dimension_global_plans_route_past_threshold(spark, monkeypatch):
    """The three dimension-global catalog queries (w_percentile_rank,
    e_gini_users, r_pareto_revenue) reroute onto the bucketed machinery
    when the Catalyst estimate exceeds the threshold: in the routed plan
    NO SinglePartition exchange feeds a Sort/Window (the one-reducer
    straggler the threshold exists for — the only survivors are 1-row
    scalar aggregates over P partial rows), and the rows are EXACTLY the
    default branch's (round-5 VERDICT #6)."""
    from vectordb_similarity_search_spark.operators import ranking
    from vectordb_similarity_search_spark.plans import REGISTRY
    from vectordb_similarity_search_spark.plans.catalog import (
        clear_plan_cache,
    )

    sf = "/root/testdata/sf0.001"
    for name in ("w_percentile_rank", "e_gini_users", "r_pareto_revenue"):
        fn = REGISTRY[name].fn
        base = fn(spark, sf)
        want = base.orderBy(*base.columns).collect()
        # the default branch DOES single-reduce a window (documented
        # dimension≪facts trade) …
        assert any(
            "Sort" in c or "Window" in c
            for c in _single_partition_consumers(base)
        ), name
        # registry plans are memoized per (session, sf_dir, query): the
        # patched threshold only reaches a FRESH build, and the routed
        # build must not be left behind for later tests either
        monkeypatch.setattr(ranking, "DIMENSION_WINDOW_MAX_BYTES", -1)
        clear_plan_cache()
        routed = fn(spark, sf)
        clear_plan_cache()
        monkeypatch.setattr(
            ranking, "DIMENSION_WINDOW_MAX_BYTES", 256 << 20
        )
        # … the routed branch never does: only final scalar aggregates
        for consumer in _single_partition_consumers(routed):
            assert "Aggregate" in consumer, (name, consumer)
        got = routed.orderBy(*routed.columns).collect()
        assert want == got, name
        # names+types must agree (nullability may differ: literal
        # fallbacks in the routed arithmetic are provably non-null)
        assert [(f.name, f.dataType) for f in base.schema] == [
            (f.name, f.dataType) for f in routed.schema
        ], name


def test_grouped_cumsum_matches_per_group_window(spark):
    """grouped_cumsum == sum() OVER (PARTITION BY grp ORDER BY o ROWS
    UNBOUNDED PRECEDING) bit-for-bit on a (grp, order)-unique frame with
    NULL order keys and NULL values, and the bucketed plan hashes on
    (grp, bucket) — never on the bare bounded-cardinality group key."""
    from vectordb_similarity_search_spark.operators.ranking import (
        auto_grouped_cumsum,
        grouped_cumsum,
    )

    rows = []
    for g in range(5):
        for i in range(600):
            o = None if i % 97 == 0 else (i * 13) % 1000 + g
            v = None if i % 31 == 0 else ((i * 7) % 50) + 1
            rows.append((f"g{g}", o, v, g * 1000 + i))
    df = (
        spark.createDataFrame(rows, "grp string, o int, v long, uid long")
        # (grp, o) must be unique: aggregate ties away first, exactly
        # like the counts-frame callers do
        .groupBy("grp", "o")
        .agg(F.sum("v").alias("v"))
    )
    w = Window.partitionBy("grp").orderBy(F.col("o").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cs", F.sum("v").over(w))
    got = grouped_cumsum(df, "v", ["grp"], "o", col_name="cs", buckets=8)
    assert want.schema == got.schema
    key = ["grp", "o"]
    assert want.orderBy(*key).collect() == got.orderBy(*key).collect()
    # routed == plain through the auto form at both thresholds
    small = auto_grouped_cumsum(df, "v", ["grp"], "o", col_name="cs",
                                max_bytes=1 << 60)
    big = auto_grouped_cumsum(df, "v", ["grp"], "o", col_name="cs",
                              max_bytes=-1)
    assert small.orderBy(*key).collect() == big.orderBy(*key).collect()
    # the bucketed branch's window partitions on (grp, _grc_bucket):
    # the plan must show the composite hashpartitioning, and no
    # partitioning on grp alone
    plan = _explain_str(big)
    assert "_grc_bucket" in plan
    import re

    bare = re.findall(r"hashpartitioning\(grp#\d+, 3?\d+\)", plan)
    assert not bare, bare


def test_mann_whitney_bucketed_branch_bit_identical(spark, sf_dir):
    """The round-7 perf-weak fix: r_mann_whitney's routed (bucketed
    grouped-cumsum) branch returns bit-identical stats to the plain
    branch — forced by dropping the routing threshold to zero."""
    from vectordb_similarity_search_spark.operators import ranking
    from vectordb_similarity_search_spark.plans.relational_queries import (
        r_mann_whitney,
    )

    plain = r_mann_whitney(spark, sf_dir).collect()
    orig = ranking.DIMENSION_WINDOW_MAX_BYTES
    ranking.DIMENSION_WINDOW_MAX_BYTES = -1
    try:
        routed = r_mann_whitney(spark, sf_dir).collect()
    finally:
        ranking.DIMENSION_WINDOW_MAX_BYTES = orig
    assert plain == routed


def test_grouped_rolling_halo_bit_identical_to_plain_window(spark):
    """grouped_rolling's routed branch (time-quantile buckets + exact
    predecessor-tail halo rows, cascading across thin buckets) produces
    bit-identical trailing-frame aggregates to the plain per-group
    window — including float stddev — on a frame with a SPARSE group
    (rows only at the extremes, so intermediate buckets are empty and
    the halo must cascade) and NULL values inside frames."""
    from vectordb_similarity_search_spark.operators.ranking import (
        grouped_rolling,
    )

    rows = []
    for i in range(4000):
        rows.append(("dense", i, float((i * 37) % 100) if i % 17 else None))
    # sparse series: 30 rows at the start, 30 at the end — every routed
    # bucket between them is empty for this group
    for i in range(30):
        rows.append(("sparse", i, float(i)))
        rows.append(("sparse", 3960 + i, float(i * 2)))
    df = spark.createDataFrame(rows, "grp string, o long, v double")

    def run(max_bytes):
        frame, w, keep = grouped_rolling(
            df, ["grp"], ["o"], 20, buckets=8, max_bytes=max_bytes
        )
        return (
            frame.withColumn("mu", F.avg("v").over(w))
            .withColumn("sd", F.stddev_samp("v").over(w))
            .withColumn("n", F.count("v").over(w))
            .where(keep)
            .select("grp", "o", "mu", "sd", "n")
            .orderBy("grp", "o")
            .collect()
        )

    plain = run(1 << 60)
    routed = run(-1)
    assert plain == routed
    assert len(plain) == len(rows)
