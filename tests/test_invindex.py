"""Materialized inverted index (operators/invindex.py): bucket-hash
parity, bit-identity with the scan-path BM25, pruned-probe plan shape,
and the zero-match caveat."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from vectordb_similarity_search_spark.operators.bm25 import bm25_topk
from vectordb_similarity_search_spark.operators.invindex import (
    _jvm_bucket,
    _py_bucket,
    bm25_topk_indexed,
    text_index_write,
)
from vectordb_similarity_search_spark.sources.tables import load_table

from .conftest import plan_of

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tidx") / "index")
    text_index_write(
        load_table(spark, SF, "documents"), path, num_buckets=16
    )
    return path


def test_bucket_hash_python_jvm_parity(spark):
    terms = ["table", "scan", "window", "agg", "", "µ-unicode", "a b"]
    jvm = {
        r.t: r.b
        for r in spark.createDataFrame([(t,) for t in terms], "t string")
        .select("t", _jvm_bucket(F.col("t"), 16).alias("b"))
        .collect()
    }
    assert jvm == {t: _py_bucket(t, 16) for t in terms}


def test_indexed_topk_bit_identical_to_scan_path(spark, index_path):
    docs = load_table(spark, SF, "documents")
    terms = ["table", "scan", "window"]
    scan = [(r.doc_id, r.bm25) for r in bm25_topk(docs, terms, k=10).collect()]
    idx = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, index_path, terms, k=10).collect()
    ]
    assert idx == scan


def test_probe_plan_prunes_buckets_and_pushes_terms(spark, index_path):
    terms = ["table", "scan"]
    plan = plan_of(bm25_topk_indexed(spark, index_path, terms, k=10))
    part = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("bucket" in ln for ln in part), plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("term" in ln and "In(" in ln for ln in pushed), plan
    # exactly one postings scan feeds the probe (stats scans are the two
    # tiny _stats relations)
    assert plan.count("Scan parquet  (") <= 4, plan


def test_zero_match_terms_return_empty_not_padded(spark, index_path):
    # the documented inverted-index caveat: no zero-score padding
    assert bm25_topk_indexed(spark, index_path, ["zzz_nope"], k=5).count() == 0


def test_missing_terms_mixed_with_present_score_like_scan_path(
    spark, index_path
):
    docs = load_table(spark, SF, "documents")
    terms = ["table", "zzz_nope"]
    scan = [(r.doc_id, r.bm25) for r in bm25_topk(docs, terms, k=5).collect()]
    idx = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, index_path, terms, k=5).collect()
    ]
    assert idx == scan


def test_sidecar_is_commit_marker(spark, index_path):
    assert os.path.exists(os.path.join(index_path, "_meta.json"))


def test_empty_terms_raise(spark, index_path):
    with pytest.raises(ValueError):
        bm25_topk_indexed(spark, index_path, [], k=5)


def test_append_probe_bit_identical_to_full_rebuild(spark, tmp_path):
    """text_index_append's contract: probing (build(80%) + append(20%))
    equals probing build(100%) BIT-identically — postings rows union,
    df/N/avgdl merge by exact integer-valued arithmetic."""
    from vectordb_similarity_search_spark.operators.invindex import (
        text_index_append,
    )

    docs = load_table(spark, SF, "documents")
    old = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) != 0)
    new = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 0)
    assert new.count() > 0

    inc = str(tmp_path / "inc")
    text_index_write(old, inc, num_buckets=16)
    appended = text_index_append(new, inc)
    assert appended == new.count()
    assert not os.path.exists(os.path.join(inc, "_append_pending"))

    full = str(tmp_path / "full")
    text_index_write(docs, full, num_buckets=16)

    terms = ["table", "scan", "window"]
    got = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, inc, terms, k=10).collect()
    ]
    want = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, full, terms, k=10).collect()
    ]
    assert got == want  # bit-identical scores, same docs, same order
    # merged stats equal the rebuild's exactly
    gm = spark.read.parquet(f"{inc}/_stats/meta").collect()[0]
    wm = spark.read.parquet(f"{full}/_stats/meta").collect()[0]
    assert (gm.n, gm.avgdl, gm.total_dl) == (wm.n, wm.avgdl, wm.total_dl)


def test_append_rejects_duplicate_ids(spark, tmp_path):
    from vectordb_similarity_search_spark.operators.invindex import (
        text_index_append,
    )

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "dup")
    text_index_write(docs, path, num_buckets=8)
    with pytest.raises(ValueError, match="insert-only"):
        text_index_append(docs.limit(3), path)
    # the rejected append left no marker and did not grow the store
    assert not os.path.exists(os.path.join(path, "_append_pending"))
    n = spark.read.parquet(f"{path}/_docs").count()
    assert n == docs.count()


def test_torn_append_refuses_probe_and_append_until_rebuild(
    spark, tmp_path
):
    from vectordb_similarity_search_spark.operators.invindex import (
        text_index_append,
    )

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "torn")
    text_index_write(docs.filter(F.col("doc_id") < 50), path, num_buckets=8)
    open(os.path.join(path, "_append_pending"), "w").close()
    # simulate swap debris from the crashed append too
    os.makedirs(os.path.join(path, "_stats", "terms__old_deadbeef"))
    with pytest.raises(RuntimeError, match="torn append"):
        bm25_topk_indexed(spark, path, ["table"], k=5)
    with pytest.raises(RuntimeError, match="torn append"):
        text_index_append(docs.filter(F.col("doc_id") >= 50), path)
    # the error message's own instruction must actually recover the
    # store: a rebuild clears the marker + swap debris and serves again
    text_index_write(docs.filter(F.col("doc_id") < 50), path, num_buckets=8)
    assert not os.path.exists(os.path.join(path, "_append_pending"))
    assert not os.path.exists(
        os.path.join(path, "_stats", "terms__old_deadbeef")
    )
    assert bm25_topk_indexed(spark, path, ["table"], k=5).count() > 0
    assert text_index_append(docs.filter(F.col("doc_id") >= 50), path) > 0


def test_append_rejects_in_batch_duplicate_ids(spark, tmp_path):
    from vectordb_similarity_search_spark.operators.invindex import (
        text_index_append,
    )

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "inbatchdup")
    text_index_write(docs.filter(F.col("doc_id") < 50), path, num_buckets=8)
    fresh = docs.filter(F.col("doc_id") >= 50)
    doubled = fresh.unionByName(fresh)
    with pytest.raises(ValueError, match="more than once"):
        text_index_append(doubled, path)
    assert not os.path.exists(os.path.join(path, "_append_pending"))
    # store untouched: the clean batch still appends afterwards
    assert text_index_append(fresh, path) == fresh.count()


def test_append_tokenizes_the_sidecar_text_column(spark, tmp_path):
    """text_col is recorded at build; an append batch carrying BOTH a
    'text' and the build's column must be tokenized on the build's."""
    from vectordb_similarity_search_spark.operators.invindex import (
        text_index_append,
    )

    docs = load_table(spark, SF, "documents")
    base = docs.filter(F.col("doc_id") < 50).withColumnRenamed(
        "text", "body"
    )
    path = str(tmp_path / "bodycol")
    text_index_write(base, path, num_buckets=8, text_col="body")
    batch = (
        docs.filter(F.col("doc_id") >= 50)
        .withColumn("body", F.col("text"))
        .withColumn("text", F.lit("decoy decoy"))
    )
    text_index_append(batch, path)
    # 'decoy' must be absent: the append tokenized body, not text
    assert bm25_topk_indexed(spark, path, ["decoy"], k=5).count() == 0
    assert bm25_topk_indexed(spark, path, ["table"], k=5).count() > 0


def test_append_empty_batch_is_noop(spark, tmp_path):
    from vectordb_similarity_search_spark.operators.invindex import (
        text_index_append,
    )

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "empty")
    text_index_write(docs, path, num_buckets=8)
    before = spark.read.parquet(f"{path}/_stats/meta").collect()
    assert text_index_append(docs.filter(F.lit(False)), path) == 0
    assert not os.path.exists(os.path.join(path, "_append_pending"))
    assert spark.read.parquet(f"{path}/_stats/meta").collect() == before


def test_appended_postings_compact_with_partitioned_compactor(
    spark, tmp_path
):
    """The ingest path creates one file batch per append inside each
    bucket dir; the EXISTING partitioned compactor (operators/compact)
    rewrites the fragmented bucket dirs in place — probes are
    bit-identical before/after and stay partition-pruned (the lakehouse
    maintenance loop closes over the text index too)."""
    from vectordb_similarity_search_spark.operators.compact import (
        compact_parquet_partitioned,
        small_file_report,
    )
    from vectordb_similarity_search_spark.operators.invindex import (
        text_index_append,
    )

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "frag")
    base = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(4)) == 0)
    text_index_write(base, path, num_buckets=4)
    for b in range(1, 4):  # three appends → ≥4 file batches per bucket
        text_index_append(
            docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(4)) == b), path
        )
    terms = ["table", "scan", "window"]
    before = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, path, terms, k=10).collect()
    ]
    rep0 = small_file_report(f"{path}/postings")
    assert rep0["worth_compacting"]  # fragmented by the appends

    res = compact_parquet_partitioned(spark, f"{path}/postings", ["bucket"])
    assert res["rewritten"] and res["dirs_touched"] > 0
    rep1 = small_file_report(f"{path}/postings")
    assert rep1["n_files"] < rep0["n_files"]

    after = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, path, terms, k=10).collect()
    ]
    assert after == before  # same docs, bit-identical scores
    plan = plan_of(bm25_topk_indexed(spark, path, terms, k=10))
    assert any(
        "bucket" in ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ), plan


def test_append_refuses_concurrent_marker(spark, tmp_path):
    """The _append_pending marker is created O_EXCL: a second append
    entering while one is in flight must fail fast instead of silently
    interleaving its stats merge (round-6 ADVICE)."""
    import os as _os

    from vectordb_similarity_search_spark.operators.invindex import (
        text_index_append,
        text_index_write,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    path = str(tmp_path / "idx")
    text_index_write(docs, path, num_buckets=2, id_col="doc_id")
    # simulate an in-flight append holding the marker
    _os.close(
        _os.open(
            f"{path}/_append_pending", _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY
        )
    )
    batch = spark.createDataFrame([(3, "delta")], "doc_id long, text string")
    with pytest.raises(RuntimeError, match="torn append|in flight"):
        text_index_append(batch, path)
