"""Runtime Bloom-filter join pruning: with a selective filter on one join
side, Catalyst bloom-aggregates its keys and pre-filters the OTHER side's
scan with might_contain — non-matching rows are dropped BEFORE the shuffle.
Locally the 10 GB application-side gate never opens, so the test lowers it
to 0 (session.runtime_bloom_filter_confs): the pruning logic is identical,
only the trigger threshold differs at real scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_similarity_search_spark.session import runtime_bloom_filter_confs
from vectordb_similarity_search_spark.sources.tables import load_table


def _with_confs(spark, confs):
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_prunes_before_shuffle(spark, sf_dir):
    confs = {
        # force a shuffle join (broadcast joins don't need the bloom path)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        **runtime_bloom_filter_confs(application_side_scan_threshold="0"),
    }
    old = _with_confs(spark, confs)
    try:
        orders = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_totalprice") > 400000)
            .select("o_orderkey")
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan
        n_bloom = joined.count()
    finally:
        _restore(spark, old)

    # same join without the runtime filter: identical result
    old = _with_confs(
        spark, {"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"}
    )
    try:
        orders = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_totalprice") > 400000)
            .select("o_orderkey")
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        assert li.join(orders, li.l_orderkey == orders.o_orderkey).count() == n_bloom
        assert n_bloom > 0
    finally:
        _restore(spark, old)
