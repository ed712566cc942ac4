"""Tests for the reference-domain surface: synthetic patients (S1-S3),
cohort stats (A1-A6), scatter-gather search (E2), embedding model +
FedAvg (V3, T1-T5, A7)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.ml.embed import (
    EmbeddingModel,
    _forward,
    _init_params,
    fedavg,
    federated_train,
    train_local,
)
from vectordb_similarity_search_spark.operators.cohort import (
    PatientSimilaritySearch,
    cohort_stats,
    zscore_params,
    zscore_vector,
)
from vectordb_similarity_search_spark.sources.synthetic import (
    FEATURES,
    gen_hospital_patients,
    gen_patients,
)

# the reference demo's query patient (similarity_search.py:613-634 shape)
DEMO_QUERY = {
    "age": 55, "meld_score": 25, "bmi": 28, "creatinine": 2.1,
    "bilirubin": 8.5, "inr": 2.2, "sodium": 133, "albumin": 2.8,
    "dialysis": 0, "ascites": 1, "encephalopathy": 1, "diabetes": 1,
    "hypertension": 1, "etiology_nash": 1, "blood_type_o": 1,
}


@pytest.fixture(scope="module")
def patients(spark):
    return gen_hospital_patients(
        spark, {"Hospital_A": 400, "Hospital_B": 300, "Hospital_C": 300}
    ).cache()


def test_generator_deterministic(spark):
    a = gen_patients(spark, 200, seed=7).collect()
    b = gen_patients(spark, 200, seed=7).collect()
    assert a == b
    c = gen_patients(spark, 200, seed=8).collect()
    assert a != c


def test_generator_null_semantics(patients):
    bad = patients.filter(
        ((F.col("received_transplant") == 1) & F.col("transplant_date").isNull())
        | ((F.col("received_transplant") == 0) & F.col("transplant_date").isNotNull())
        | ((F.col("received_transplant") == 0) & F.col("days_on_waitlist").isNull())
        | ((F.col("received_transplant") == 1) & F.col("days_on_waitlist").isNotNull())
    ).count()
    assert bad == 0


def test_generator_distributions(patients):
    row = patients.agg(
        F.min("age").alias("amin"), F.max("age").alias("amax"),
        F.avg("dialysis").alias("dial"), F.avg("received_transplant").alias("tx"),
    ).head()
    assert 18 <= row.amin and row.amax <= 80
    assert 0.05 < row.dial < 0.30
    assert 0.05 < row.tx < 0.95


def test_cohort_stats_consistency(patients):
    s = cohort_stats(patients).head()
    assert s.total_patients == 1000
    assert s.transplanted + s.not_transplanted == s.total_patients
    assert abs(s.transplant_rate - s.transplanted / s.total_patients) < 1e-6
    wl = s.waitlist_active + s.waitlist_removed_sick + s.waitlist_removed_improved + s.waitlist_deceased
    assert wl == s.not_transplanted
    assert abs(s.avg_wait_months - s.avg_wait_days / 30.44) < 1e-4


def test_search_self_retrieval(patients):
    engine = PatientSimilaritySearch(patients)
    target = patients.filter(
        (F.col("hospital") == "Hospital_B") & (F.col("patient_id") == "PT_000042")
    ).head()
    query = {c: target[c] for c in FEATURES}
    hits = engine.search(query, top_k=3).collect()
    assert (hits[0].patient_id, hits[0].hospital) == ("PT_000042", "Hospital_B")
    assert hits[0].score > 0.999999


def test_search_hospital_pruning(patients):
    engine = PatientSimilaritySearch(patients)
    hits = engine.search(DEMO_QUERY, top_k=5, hospitals=["Hospital_C"]).collect()
    assert len(hits) == 5
    assert all(h.hospital == "Hospital_C" for h in hits)


def test_search_with_stats(patients):
    engine = PatientSimilaritySearch(patients)
    hits, stats = engine.search_with_stats(DEMO_QUERY, top_k=10)
    assert hits.count() == 10
    assert stats.head().total_patients == 10


def test_forward_deterministic():
    p1, p2 = _init_params(1), _init_params(1)
    X = np.random.default_rng(0).standard_normal((8, 20))
    assert np.array_equal(_forward(p1, X), _forward(p2, X))


def test_fedavg_equal_weights_is_mean():
    a, b = _init_params(1), _init_params(2)
    avg = fedavg([(a, 10), (b, 10)])
    for pa, pb, pm in zip(a, b, avg):
        assert np.allclose(pm, (pa + pb) / 2)


def test_training_reduces_gram_loss():
    from vectordb_similarity_search_spark.ml.embed import _grads

    rng = np.random.default_rng(0)
    X = rng.standard_normal((128, 20))
    params = _init_params(42)
    loss0, _ = _grads(params, X)
    trained, _ = train_local(params, X, epochs=10, batch_size=32)
    loss1, _ = _grads(trained, X)
    assert loss1 < loss0


def test_spark_transform_matches_numpy(spark):
    model = EmbeddingModel.init(3)
    rng = np.random.default_rng(5)
    X = rng.standard_normal((16, 20))
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "id long, features array<double>",
    )
    got = {r.id: np.array(r.embedding) for r in model.transform(df).collect()}
    want = _forward(model.params, X).astype(np.float32)
    for i in range(16):
        assert np.allclose(got[i], want[i], atol=1e-5)


def test_spark_transform_matches_numpy_with_batchnorm(spark):
    """Inference-mode BatchNorm path: Spark transform == numpy forward with
    the same running stats, stats are deterministic across partitioning,
    and normalized activations actually have ~zero mean / unit variance."""
    from vectordb_similarity_search_spark.ml.embed import fit_batchnorm_stats

    model = EmbeddingModel.init(3)
    rng = np.random.default_rng(5)
    X = rng.standard_normal((64, 20))
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "id long, features array<double>",
    )
    bn_model = model.with_batchnorm(df)
    # repeatable: identical stats for the same input (fixed partitioning)
    bn_rep = fit_batchnorm_stats(model.params, df)
    # stable: equal to float tolerance across partitionings (reassociation)
    bn2 = fit_batchnorm_stats(model.params, df.repartition(7))
    for (m1, v1), (mr, vr), (m2, v2) in zip(bn_model.bn, bn_rep, bn2):
        assert np.array_equal(m1, mr) and np.array_equal(v1, vr)
        assert np.allclose(m1, m2, atol=1e-10) and np.allclose(v1, v2, atol=1e-10)
    # the stats describe the SERVED network: layer-1 raw activations
    # normalize to mean ~0, and layer-2 activations computed with BN1
    # already applied (what _forward runs) normalize to mean ~0 under
    # bn[1] — i.e. BN2 was fit on post-BN1 inputs, torch-eval()-faithful
    W1, b1, W2, b2 = model.params[:4]
    H1 = np.maximum(X @ W1 + b1, 0.0)
    z1 = (H1 - bn_model.bn[0][0]) / np.sqrt(bn_model.bn[0][1] + 1e-5)
    assert abs(z1.mean()) < 1e-9
    H2 = np.maximum(z1 @ W2 + b2, 0.0)
    z2 = (H2 - bn_model.bn[1][0]) / np.sqrt(bn_model.bn[1][1] + 1e-5)
    assert abs(z2.mean()) < 1e-9
    got = {r.id: np.array(r.embedding) for r in bn_model.transform(df).collect()}
    want = _forward(model.params, X, bn_model.bn).astype(np.float32)
    for i in range(64):
        assert np.allclose(got[i], want[i], atol=1e-5)
    # BN must actually change the output vs the plain path
    plain = _forward(model.params, X)
    assert not np.allclose(plain, _forward(model.params, X, bn_model.bn))


def test_federated_train_end_to_end(spark, patients):
    engine_feats = PatientSimilaritySearch(patients).store.select("hospital", "features")
    model = federated_train(
        engine_feats, rounds=1, local_epochs=1, max_rows_per_group=200
    )
    assert len(model.params) == 6
    emb = model.transform_vector([0.0] * 20)
    assert len(emb) == 128
