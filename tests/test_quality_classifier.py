"""Trained quality classifiers (ml/quality.py): the iterative hashed-ngram
logistic regression (offline op) and the closed-form Naive Bayes behind
the t_nb_quality catalog query.

The logreg's headline property is BIT-determinism of distributed training:
per-document gradient contributions are quantized to int64 before any
summation, so the reduce is exact integer arithmetic and the fitted
weights are identical under any partitioning — stronger than float-sum
determinism any ordering trick can give.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.functions.text import (
    LANG_MARKERS,
    stopword_ratio,
)
from vectordb_similarity_search_spark.ml.quality import (
    QualityModel,
    fit_quality_classifier,
    nb_quality_log_odds,
    score_quality,
)
from vectordb_similarity_search_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _extremes(spark):
    """Quartile-extreme weak labels on the en-stopword ratio — the
    separable train set (the middle of the ratio distribution is noise
    at this corpus size)."""
    d = load_table(spark, SF, "documents").withColumn(
        "_r", stopword_ratio("text", LANG_MARKERS["en"])
    )
    lo, hi = d.approxQuantile("_r", [0.25, 0.75], 0.0)
    return d.filter((F.col("_r") <= lo) | (F.col("_r") >= hi)).withColumn(
        "_lbl", F.col("_r") >= hi
    )


def test_fit_is_bit_deterministic_across_partitionings(spark):
    docs = _extremes(spark)
    a = fit_quality_classifier(docs.repartition(3), "_lbl", dim=512, iters=4)
    b = fit_quality_classifier(docs.repartition(16), "_lbl", dim=512, iters=4)
    assert np.array_equal(a.weights, b.weights)  # BIT-equal, not allclose


def test_fit_learns_the_separable_extremes(spark):
    docs = _extremes(spark)
    model = fit_quality_classifier(docs, "_lbl", dim=4096, iters=30)
    pdf = score_quality(docs, model).select("_lbl", "quality_prob").toPandas()
    acc = ((pdf.quality_prob > 0.5) == pdf._lbl).mean()
    assert acc >= 0.9, acc


def test_loss_decreases_with_training(spark):
    docs = _extremes(spark)
    pdf = docs.select("text", F.col("_lbl").cast("double").alias("y")).toPandas()

    def logloss(model):
        p = np.array([model.predict_one(t) for t in pdf.text])
        y = pdf.y.to_numpy()
        p = np.clip(p, 1e-12, 1 - 1e-12)
        return float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).mean())

    m1 = fit_quality_classifier(docs, "_lbl", dim=1024, iters=2)
    m2 = fit_quality_classifier(docs, "_lbl", dim=1024, iters=12)
    base = float(-np.log(0.5))  # untrained w=0 predicts 0.5 everywhere
    assert logloss(m2) < logloss(m1) < base


def test_score_quality_matches_predict_one(spark):
    docs = _extremes(spark).limit(20)
    model = fit_quality_classifier(docs, "_lbl", dim=512, iters=3)
    rows = score_quality(docs, model).select("text", "quality_prob").collect()
    for r in rows:
        assert r.quality_prob == pytest.approx(model.predict_one(r.text), abs=1e-12)


def test_empty_train_set_raises(spark):
    docs = load_table(spark, SF, "documents").filter(F.lit(False)).withColumn(
        "_lbl", F.lit(True)
    )
    with pytest.raises(ValueError, match="empty"):
        fit_quality_classifier(docs, "_lbl", dim=64, iters=1)


def test_nb_separates_the_weak_label(spark):
    """Sign agreement of the NB log-odds with its own training label —
    the closed-form model must beat the base rate by a wide margin."""
    d = load_table(spark, SF, "documents").withColumn(
        "_lbl", stopword_ratio("text", LANG_MARKERS["en"]) >= 0.06
    )
    pdf = nb_quality_log_odds(d, "_lbl").toPandas()
    agree = ((pdf.nb_log_odds > 0) == (pdf.label == 1)).mean()
    base = max(pdf.label.mean(), 1 - pdf.label.mean())
    assert agree >= base + 0.1, (agree, base)


def test_nb_is_fully_lazy(spark):
    """The NB train+score is one lazy plan — building it must launch no
    Spark job (the catalog query's zero-job-build discipline)."""
    d = load_table(spark, SF, "documents").withColumn(
        "_lbl", stopword_ratio("text", LANG_MARKERS["en"]) >= 0.06
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    nb_quality_log_odds(d, "_lbl")
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before


def test_nb_single_class_raises_at_execution(spark):
    """Degenerate all-one-class labels must raise (lazily — the build
    stays zero-job), not emit Inf log-odds."""
    d = load_table(spark, SF, "documents").withColumn("_lbl", F.lit(True))
    df = nb_quality_log_odds(d, "_lbl")  # builds fine
    with pytest.raises(Exception, match="single-class"):
        df.collect()
