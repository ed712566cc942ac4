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
