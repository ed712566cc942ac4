"""Incremental near-dup: signature store + new-batch-vs-corpus pairing
(operators/dedup.py::write_signature_store / minhash_lsh_pairs_incremental).

Ground truth: the committed d_minhash_lsh_pairs fixture — the batch
operator's verified pairs over the whole sf0.01 corpus. Splitting the
corpus at doc_id 400, the incremental run of the 400+ batch against the
<400 store must reproduce exactly the cross-split subset of those pairs
(same hash family, same threshold), without ever re-pairing the corpus.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.dedup import (
    minhash_lsh_pairs_incremental,
    write_signature_store,
)
from vectordb_similarity_search_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"
SPLIT = 400


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sigstore") / "sigs")
    docs = load_table(spark, SF, "documents")
    write_signature_store(docs.filter(F.col("doc_id") < SPLIT), path)
    return path


def test_incremental_matches_batch_cross_pairs(spark, store):
    docs = load_table(spark, SF, "documents")
    new = docs.filter(F.col("doc_id") >= SPLIT)
    corpus = docs.filter(F.col("doc_id") < SPLIT)
    got = (
        minhash_lsh_pairs_incremental(new, store, corpus, threshold=0.8)
        .toPandas()
        .sort_values(["id_new", "id_corpus"])
        .reset_index(drop=True)
    )
    # ground truth: committed batch-operator fixture, cross-split subset
    full = pd.read_parquet(
        os.path.join("tests", "fixtures", "d_minhash_lsh_pairs_expected.parquet")
    )
    cross = full[(full.id_a < SPLIT) & (full.id_b >= SPLIT)]
    want = (
        cross.rename(columns={"id_b": "id_new", "id_a": "id_corpus"})[
            ["id_new", "id_corpus", "jaccard"]
        ]
        .sort_values(["id_new", "id_corpus"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0  # the split actually has cross pairs


def test_store_append_extends_coverage(spark, store, tmp_path):
    """Accepting a batch appends its signatures; the NEXT batch then
    collides with it. Use two halves of the known near-dup pair set."""
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "sigs2")
    write_signature_store(docs.filter(F.col("doc_id") < SPLIT), path)
    batch1 = docs.filter((F.col("doc_id") >= SPLIT) & (F.col("doc_id") < 450))
    batch2 = docs.filter(F.col("doc_id") >= 450)
    # before appending batch1, batch2 cannot pair with it
    pre = minhash_lsh_pairs_incremental(batch2, path, docs, threshold=0.8).toPandas()
    assert not ((pre.id_corpus >= SPLIT) & (pre.id_corpus < 450)).any()
    write_signature_store(batch1, path, mode="append")
    post = minhash_lsh_pairs_incremental(batch2, path, docs, threshold=0.8).toPandas()
    # the committed fixture has 435-486 as a verified pair across 450
    assert ((post.id_new == 486) & (post.id_corpus == 435)).any()


def test_store_family_mismatch_rejected(spark, store):
    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError, match="family mismatch"):
        write_signature_store(
            docs.filter(F.col("doc_id") >= SPLIT), store,
            mode="append", seed=7,
        )


def test_store_meta_invisible_to_scan(spark, store):
    """_store_meta.json must not confuse the parquet scan of the store."""
    df = spark.read.parquet(store)
    assert set(df.columns) == {"doc_id", "sig"}
    assert df.count() == SPLIT


def test_incremental_never_emits_corpus_corpus_pairs(spark, store):
    docs = load_table(spark, SF, "documents")
    new = docs.filter(F.col("doc_id") >= SPLIT)
    out = minhash_lsh_pairs_incremental(new, store, docs, threshold=0.3).toPandas()
    assert (out.id_new >= SPLIT).all() and (out.id_corpus < SPLIT).all()


def test_reprobe_after_append_emits_no_self_pairs(spark, tmp_path):
    """A replayed probe of a batch already appended to the store (crash
    between append and downstream commit) must not pair docs with
    themselves — the batch operator's b > a exclusion, incrementally."""
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "sigs3")
    write_signature_store(docs.filter(F.col("doc_id") < SPLIT), path)
    batch = docs.filter(F.col("doc_id") >= SPLIT)
    write_signature_store(batch, path, mode="append")  # accepted...
    replay = minhash_lsh_pairs_incremental(batch, path, docs, threshold=0.8).toPandas()
    assert not (replay.id_new == replay.id_corpus).any()
    # and it still finds the legit cross pairs
    assert ((replay.id_new == 486) & (replay.id_corpus == 435)).any()


def test_append_without_meta_rejected(spark, tmp_path):
    """An append onto a store whose first build never committed its meta
    (crashed mid-build) must refuse loudly, not stamp fresh meta over
    signatures of an unknown hash family."""
    import os as _os

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "sigs4")
    write_signature_store(docs.filter(F.col("doc_id") < 50), path)
    _os.remove(_os.path.join(path, "_store_meta.json"))
    with pytest.raises(ValueError, match="no committed meta"):
        write_signature_store(
            docs.filter(F.col("doc_id") >= 50), path, mode="append"
        )


def test_incremental_jaccard_matches_batch_rounding(spark, store):
    """Both operators round exact Jaccard to 6 decimals — the values must
    be BIT-equal to the committed batch fixture, not merely close."""
    docs = load_table(spark, SF, "documents")
    got = (
        minhash_lsh_pairs_incremental(
            docs.filter(F.col("doc_id") >= SPLIT), store, docs, threshold=0.8
        )
        .toPandas()
        .sort_values(["id_new", "id_corpus"])
        .reset_index(drop=True)
    )
    full = pd.read_parquet(
        os.path.join("tests", "fixtures", "d_minhash_lsh_pairs_expected.parquet")
    )
    cross = full[(full.id_a < SPLIT) & (full.id_b >= SPLIT)]
    want = (
        cross.rename(columns={"id_b": "id_new", "id_a": "id_corpus"})[
            ["id_new", "id_corpus", "jaccard"]
        ]
        .sort_values(["id_new", "id_corpus"])
        .reset_index(drop=True)
    )
    assert list(got.jaccard) == list(want.jaccard)  # bit-equal
