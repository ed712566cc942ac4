"""operators/graph.pagerank: exact-integer PageRank semantics.

The catalog row (r_pagerank) is pinned by its expected-parquet oracle;
these tests pin the operator against a pure-Python integer replica —
bit-exact, every node — plus mass conservation and validation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.graph import (
    RANK_SCALE,
    pagerank,
)


def _python_pagerank(edges, n_iter=8, damping_pct=85):
    """Reference replica of the documented integer recurrence."""
    w: dict = {}
    for s, d_, c in edges:
        w[(s, d_)] = w.get((s, d_), 0) + c
    out_w: dict = {}
    for (s, _), c in w.items():
        out_w[s] = out_w.get(s, 0) + c
    nodes = sorted({s for s, _ in w} | {d_ for _, d_ in w})
    n = len(nodes)
    r = {v: RANK_SCALE for v in nodes}
    for _ in range(n_iter):
        inbound = dict.fromkeys(nodes, 0)
        for (s, d_), c in w.items():
            inbound[d_] += r[s] * c // out_w[s]
        total = sum(r.values())
        carried = sum(inbound.values())
        share = (total - carried) // n
        r = {
            v: (RANK_SCALE * (100 - damping_pct)
                + damping_pct * (inbound[v] + share)) // 100
            for v in nodes
        }
    return r


@pytest.fixture(scope="module")
def small_edges(spark):
    rows = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1),
        ("d", "c", 5),  # d is a source-only node
        ("b", "e", 1),  # e is dangling (sink)
        ("a", "b", 2),  # duplicate edge — must merge into w=5
    ]
    return rows, spark.createDataFrame(rows, "src string, dst string, w long")


def test_pagerank_matches_python_replica_bitexact(spark, small_edges):
    rows, df = small_edges
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank(df, weight="w").collect()
    }
    assert got == _python_pagerank(rows)


def test_pagerank_conserves_mass(spark, small_edges):
    rows, df = small_edges
    res = pagerank(df, weight="w", n_iter=4).agg(
        F.sum("rank_units").alias("s"), F.count("*").alias("n")
    ).first()
    # conserved up to < 2n int units lost per iteration (final div 100
    # loses < 1 unit/node; the missing-share div loses < 1 unit/node)
    assert abs(res["s"] - res["n"] * RANK_SCALE) < 4 * 2 * res["n"]


def test_pagerank_unweighted_defaults(spark, small_edges):
    rows, df = small_edges
    got = {
        r["node"]: r["rank_units"] for r in pagerank(df).collect()
    }
    assert got == _python_pagerank([(s, d_, 1) for s, d_, _ in rows])


def test_pagerank_dangling_receives_base_plus_share(spark, small_edges):
    rows, df = small_edges
    got = {r["node"]: r["rank"] for r in pagerank(df, weight="w").collect()}
    # every node keeps a positive rank; the pure sink still holds mass
    assert all(v > 0 for v in got.values())
    assert got["e"] > 0.15 - 1e-6  # at least the damping base


def test_pagerank_validation(spark, small_edges):
    _, df = small_edges
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=100)


def test_pagerank_weighted_overflow_guard(spark, small_edges):
    """A weight large enough that r*w could breach int64 must raise at
    build time with a clear message, never wrap/throw mid-iteration."""
    _, df = small_edges
    huge = df.withColumn("w", F.lit(2_000_000_000))  # 5 nodes * 1e9 * 2e9 > 2^63
    with pytest.raises(ValueError, match="overflow"):
        pagerank(huge, weight="w")


def test_pagerank_replica_parity_on_fixture_graph(spark, sf_dir):
    """Same bit-exact parity on the real catalog edge list (sf0.001-sized
    via the session fixture dir) — covers multi-partition layouts."""
    from vectordb_similarity_search_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
    )
    rows = [(r["src"], r["dst"], 1) for r in edges.collect()]
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank(edges, n_iter=3).collect()
    }
    assert got == _python_pagerank(rows, n_iter=3)
