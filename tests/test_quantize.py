"""SQ8 quantization: round-trip error bound, compression, rescored recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.quantize import Sq8Model, fit_sq8
from vectordb_similarity_search_spark.operators.topk import knn
from vectordb_similarity_search_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def model(spark, emb):
    return fit_sq8(emb)


def test_roundtrip_error_bounded(spark, emb, model):
    """Decode error per element is at most scale/2 (affine rounding)."""
    codes = model.encode(emb).collect()
    orig = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    for r in codes:
        x = orig[r.vec_id]
        dec = model.lo + np.frombuffer(r.code, dtype=np.uint8) * model.scale
        assert np.all(np.abs(dec - x) <= model.scale / 2 + 1e-12)


def test_codes_are_4x_smaller(spark, emb, model):
    r = model.encode(emb).select("code").head()
    d = len(emb.select("embedding").head()[0])
    assert len(r.code) == d  # 1 byte/dim vs 4 (float32) — 4x


def test_rescored_search_matches_exact(spark, emb, model):
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    corpus = emb.filter(F.col("vec_id") != 0)
    codes = model.encode(corpus)
    got = [
        r.vec_id
        for r in model.search(codes, corpus, qv, k=10, rescore=50).collect()
    ]
    want = [r.vec_id for r in knn(corpus, qv, 10).collect()]
    # rescore makes the top-k exact as long as the true winners sit inside
    # the approximate top-50 — they do on this corpus
    assert got == want


# --------------------------- binary (thermometer) quantization ----------


@pytest.fixture(scope="module")
def bq(spark, emb):
    from vectordb_similarity_search_spark.operators.quantize import fit_bq

    corpus = emb.filter(F.col("vec_id") != 0)
    model, n = fit_bq(corpus, dim=64)
    return model, n, corpus


def test_bq_thermometer_identity(spark, emb, bq):
    """Hamming distance between packed codes == L1 distance between
    quantized levels (the property that makes popcount a geometry)."""
    model, _, corpus = bq
    X = np.vstack(
        [np.array(r.embedding, dtype=np.float64) for r in corpus.collect()]
    )
    levels = (X[:, None, :] > model.thresholds[None, :, :]).sum(axis=1)
    words = model._pack(X).view(np.uint64)
    a, b = 0, 1
    ham = bin(int(words[a, 0] ^ words[b, 0]))[2:].count("1") + sum(
        bin(int(words[a, w] ^ words[b, w]))[2:].count("1")
        for w in range(1, model.n_words)
    )
    assert ham == int(np.abs(levels[a] - levels[b]).sum())


def test_bq_codes_compression(spark, emb, bq):
    model, _, corpus = bq
    r = model.encode(corpus).select("bq").head()
    # 64 dims x 3 thermometer bits = 192 bits = 3 int64 words (24 bytes)
    # vs 256 bytes of float32 — ~10.7x
    assert len(r.bq) == 3 == model.n_words


def test_bq_search_exact_with_margin(spark, emb, bq):
    """Served top-10 is exact, and the screen depth the catalog query uses
    (max(200, 2n/5)) is >=2x the worst Hamming rank of the true top-10."""
    model, n, corpus = bq
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    codes = model.encode(corpus)
    rescore = max(200, (2 * n) // 5)
    got = [
        (r.vec_id, round(r.score, 6))
        for r in model.search(codes, corpus, qv, k=10, rescore=rescore).collect()
    ]
    want = [
        (r.vec_id, round(r.score, 6)) for r in knn(corpus, qv, 10).collect()
    ]
    assert got == want
    ranked = (
        codes.select("vec_id", model.hamming_to("bq", qv).alias("h"))
        .orderBy("h", "vec_id")
        .collect()
    )
    rank = {r.vec_id: i for i, r in enumerate(ranked)}
    worst = max(rank[v] for v, _ in want)
    assert rescore >= 2 * worst, (worst, rescore)


def test_bq_encode_layout_independent(spark, emb, bq):
    """Codes are a pure content function: any repartitioning of the input
    produces byte-identical words per id (fit is exact percentiles, also
    content-pure — refit on shuffled input must agree)."""
    from vectordb_similarity_search_spark.operators.quantize import fit_bq

    model, _, corpus = bq
    base = {r.vec_id: list(r.bq) for r in model.encode(corpus).collect()}
    shuffled = corpus.repartition(7, "label")
    model2, _ = fit_bq(shuffled, dim=64)
    assert np.allclose(model2.thresholds, model.thresholds)
    again = {r.vec_id: list(r.bq) for r in model2.encode(shuffled).collect()}
    assert again == base


def test_bq_sampled_fit_still_exact(spark, emb):
    """sample_fraction bounds the percentile aggregate's state (the 100 TB
    lever) while the served top-k stays exact by the rescore contract;
    the returned count stays the exact corpus count."""
    from vectordb_similarity_search_spark.operators.quantize import fit_bq

    corpus = emb.filter(F.col("vec_id") != 0)
    model, n = fit_bq(corpus, dim=64, sample_fraction=0.5)
    assert n == corpus.count()  # count is exact even when fit is sampled
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    codes = model.encode(corpus)
    got = [
        (r.vec_id, round(r.score, 6))
        for r in model.search(
            codes, corpus, qv, k=10, rescore=max(200, (2 * n) // 5)
        ).collect()
    ]
    want = [(r.vec_id, round(r.score, 6)) for r in knn(corpus, qv, 10).collect()]
    assert got == want
    with pytest.raises(ValueError, match="sample_fraction"):
        fit_bq(corpus, dim=64, sample_fraction=0.0)
