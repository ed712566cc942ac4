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


# ---------------------------------------------------------------------------
# knn_graph: block-grid exact k-NN graph
# ---------------------------------------------------------------------------


def _brute_knn_edges(vecs: dict, k: int):
    """Pure-Python exact k-NN edges (cosine desc, dst asc), sequential
    left-to-right fold — the oracle association."""
    def seq_dot(a, b):
        acc = a[0] * b[0]
        for i in range(1, len(a)):
            acc = acc + a[i] * b[i]
        return acc

    norms = {i: seq_dot(v, v) ** 0.5 for i, v in vecs.items()}
    out = []
    for s, vs in vecs.items():
        if norms[s] == 0.0:
            continue
        scored = [
            (seq_dot(vs, vecs[d]) / (norms[s] * norms[d]), d)
            for d in vecs
            if d != s and norms[d] != 0.0
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        for r, (c, d) in enumerate(scored[:k], start=1):
            out.append((s, d, round(c, 6), r))
    return sorted(out)


@pytest.fixture(scope="module")
def knn_vecs():
    import random

    rng = random.Random(7)
    return {i: [rng.uniform(-1, 1) for _ in range(16)] for i in range(40)}


def test_knn_graph_matches_bruteforce(spark, knn_vecs):
    from vectordb_similarity_search_spark.operators.graph import knn_graph

    df = spark.createDataFrame(
        [(i, v) for i, v in knn_vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        (r["src"], r["dst"], round(r["cosine"], 6), r["rank"])
        for r in knn_graph(df, k=5, n_blocks=4).collect()
    )
    assert got == _brute_knn_edges(knn_vecs, 5)


def test_knn_graph_layout_and_blockcount_independent(spark, knn_vecs):
    """Same edges whatever the partition layout or grid size (the local
    top-k cut + 1e-9 ulp slack must never lose a true winner)."""
    from vectordb_similarity_search_spark.operators.graph import knn_graph

    df = spark.createDataFrame(
        [(i, v) for i, v in knn_vecs.items()],
        "vec_id long, embedding array<double>",
    )
    expect = _brute_knn_edges(knn_vecs, 3)
    for n_blocks, parts in ((1, 1), (3, 7), (8, 2)):
        got = sorted(
            (r["src"], r["dst"], round(r["cosine"], 6), r["rank"])
            for r in knn_graph(
                df.repartition(parts), k=3, n_blocks=n_blocks
            ).collect()
        )
        assert got == expect, (n_blocks, parts)


def test_knn_graph_zero_vectors_and_small_cells(spark):
    """Zero-norm rows contribute no edges in either direction; cells
    smaller than k return everything they have."""
    from vectordb_similarity_search_spark.operators.graph import knn_graph

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 0.0]),  # zero vector
            (4, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = knn_graph(df, k=10, n_blocks=3).collect()
    ids = {(r["src"], r["dst"]) for r in rows}
    assert all(3 not in pair for pair in ids)
    # every surviving node ranks both other non-zero nodes
    for s in (1, 2, 4):
        assert sum(1 for a, b in ids if a == s) == 2


def test_knn_graph_validation(spark):
    from vectordb_similarity_search_spark.operators.graph import knn_graph

    df = spark.createDataFrame(
        [(1, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        knn_graph(df, k=0)
    with pytest.raises(ValueError):
        knn_graph(df, k=1, n_blocks=0)


def test_knn_graph_zero_vector_never_evicts_negative_winner(spark):
    """Regression (review find): a zero vector's 0.0 screening score must
    not occupy the local top-k cut and evict a true negative-cosine
    neighbor — zero-norm rows are removed from the slab BEFORE the cut."""
    from vectordb_similarity_search_spark.operators.graph import knn_graph

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [-1.0, 0.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    for n_blocks in (1, 3):
        got = sorted(
            (r["src"], r["dst"], round(r["cosine"], 6), r["rank"])
            for r in knn_graph(df, k=1, n_blocks=n_blocks).collect()
        )
        assert got == [(1, 2, -1.0, 1), (2, 1, -1.0, 1)], n_blocks


# --------------------------------------------------------------------------
# triangle_stats
# --------------------------------------------------------------------------


def _tri_brute(edges: list[tuple[int, int]]) -> int:
    es = set(edges)
    nodes = sorted({n for e in edges for n in e})
    cnt = 0
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            for c in nodes[nodes.index(b) + 1:]:
                if (
                    ((a, b) in es or (b, a) in es)
                    and ((b, c) in es or (c, b) in es)
                    and ((a, c) in es or (c, a) in es)
                ):
                    cnt += 1
    return cnt


def test_triangle_stats_known_graphs(spark):
    from vectordb_similarity_search_spark.operators.graph import triangle_stats

    # K4: 4 triangles, 12 wedges, coefficient exactly 1
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    row = triangle_stats(
        spark.createDataFrame(k4, "u long, v long")
    ).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles, row.n_wedges) == (
        4, 6, 4, 12,
    )
    assert row.clustering_coeff == 1.0

    # path graph: zero triangles, wedges = interior nodes
    path = [(i, i + 1) for i in range(5)]
    row = triangle_stats(
        spark.createDataFrame(path, "u long, v long")
    ).collect()[0]
    assert row.n_triangles == 0 and row.n_wedges == 4


def test_triangle_stats_matches_bruteforce_random(spark):
    import random

    from vectordb_similarity_search_spark.operators.graph import triangle_stats

    rng = random.Random(7)
    edges = sorted(
        {
            tuple(sorted(rng.sample(range(30), 2)))
            for _ in range(160)
        }
    )
    row = triangle_stats(
        spark.createDataFrame(edges, "u long, v long")
    ).collect()[0]
    assert row.n_triangles == _tri_brute(edges)
    assert row.n_edges == len(edges)


def test_triangle_stats_skewed_hub_layout_independent(spark):
    """A hub node adjacent to everything (worst raw-degree skew): the
    orientation must still count exactly, independent of partitioning."""
    from vectordb_similarity_search_spark.operators.graph import triangle_stats
    from pyspark.sql import functions as F

    hub = [(0, i) for i in range(1, 25)] + [(i, i + 1) for i in range(1, 24)]
    want = _tri_brute(hub)
    assert want == 23  # hub + each consecutive rim pair
    for parts in (1, 7):
        df = spark.createDataFrame(hub, "u long, v long").repartition(
            parts, F.col("u")
        )
        assert triangle_stats(df).collect()[0].n_triangles == want


def test_triangle_stats_wedge_free_graph_yields_null_coeff(spark):
    """Review find: a perfect matching has zero wedges — the coefficient
    must be NULL (house div-by-zero discipline, DuckDB 0/0 parity), never
    NaN, and the wedge count 0, never NULL."""
    from vectordb_similarity_search_spark.operators.graph import triangle_stats

    row = triangle_stats(
        spark.createDataFrame([(1, 2), (3, 4)], "u long, v long")
    ).collect()[0]
    assert row.n_wedges == 0
    assert row.clustering_coeff is None
