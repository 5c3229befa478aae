"""Distributed logistic-regression trainer == pure-numpy reference.

The trainer (`operators/classifier.py`) is a bounded-model-artifact loop
like `kmeans_step`: each iteration is one scalar aggregation over the
corpus. These tests pin (a) bit-level agreement with a numpy full-batch
GD on the same data, (b) that training actually LEARNS (loss decreases,
accuracy beats the majority class on a separable problem), and (c) the
zero-variance standardization contract.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pydatalake_spark.operators.classifier import (
    logreg_accuracy,
    logreg_step,
    logreg_train,
    logreg_z,
    standardize,
)


def _numpy_gd(X, y, iters, lr, init=None):
    w = np.zeros(X.shape[1]) if init is None else np.array(init[:-1], float)
    b = 0.0 if init is None else float(init[-1])
    for _ in range(iters):
        z = X @ w + b
        r = 1.0 / (1.0 + np.exp(-z)) - y
        w = w - lr * (X * r[:, None]).mean(axis=0)
        b = b - lr * r.mean()
    return [*w.tolist(), b]


def _toy(spark, n=400, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3))
    # separable-with-noise boundary on the first two features
    y = (X[:, 0] + 0.5 * X[:, 1] + rng.normal(scale=0.3, size=n) > 0).astype(
        float
    )
    rows = [(float(a), float(b), float(c), float(t)) for (a, b, c), t in zip(X, y)]
    df = spark.createDataFrame(
        rows, schema="x0 double, x1 double, x2 double, y double"
    )
    return df, X, y


def test_logreg_train_matches_numpy(spark):
    df, X, y = _toy(spark)
    w_spark = logreg_train(df, ["x0", "x1", "x2"], "y", iters=4, lr=1.5)
    w_np = _numpy_gd(X, y, iters=4, lr=1.5)
    # both sides are double GD over the same rows; only summation order
    # differs (Spark partial aggregates) — agreement to 1e-9 relative
    assert w_spark == pytest.approx(w_np, rel=1e-9, abs=1e-12)


def test_logreg_training_learns(spark):
    df, X, y = _toy(spark)
    cols = ["x0", "x1", "x2"]
    w0 = [0.0, 0.0, 0.0, 0.0]
    w1 = logreg_step(df, cols, "y", w0, lr=1.5)
    w5 = logreg_train(df, cols, "y", iters=5, lr=1.5)

    def loss(w):
        z = X @ np.array(w[:-1]) + w[-1]
        return float(np.mean(np.log1p(np.exp(-z)) * y + np.log1p(np.exp(z)) * (1 - y)))

    assert loss(w1) < loss(w0)
    assert loss(w5) < loss(w1)
    majority = max(y.mean(), 1 - y.mean())
    assert logreg_accuracy(df, cols, "y", w5) > majority


def test_standardize_zero_variance_and_stats(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0, 0.0), (3.0, 5.0, 0.0), (5.0, 5.0, 1.0)],
        schema="a double, c double, y double",
    )
    out, stats = standardize(df, ["a", "c"])
    rows = sorted(tuple(r) for r in out.select("a", "c").collect())
    sd = math.sqrt(8.0 / 3.0)  # population stddev of [1,3,5]
    expect = sorted(((v - 3.0) / sd, 0.0) for v in (1.0, 3.0, 5.0))
    for got, exp in zip(rows, expect):
        assert got[0] == pytest.approx(exp[0])
        assert got[1] == exp[1]
    assert stats["a"][0] == pytest.approx(3.0)
    assert stats["a"][1] == pytest.approx(sd)
    assert stats["c"][1] == pytest.approx(0.0)


def test_logreg_z_arity_guard(spark):
    with pytest.raises(ValueError):
        logreg_z(["a", "b"], [1.0, 2.0])  # missing bias


def test_distilled_scoring_is_lazy_and_consistent(spark):
    """The distilled query's scoring plan must (a) agree with the
    trainer's reported accuracy (same weights, same rows), and (b) be a
    map-only scan — no exchange: training collects scalars, scoring
    folds them back as literals."""
    from pydatalake_spark.queries.text import (
        quality_classifier_distilled_q,
        quality_classifier_train_q,
    )

    sf = "/root/testdata/sf0.001"
    scored = quality_classifier_distilled_q(spark, sf)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only deploy path
    rows = scored.collect()
    acc_from_scores = sum(r["agree"] for r in rows) / len(rows)
    trained = quality_classifier_train_q(spark, sf).collect()[0]
    assert acc_from_scores == pytest.approx(trained["accuracy"], abs=1e-12)
    # scores are probabilities; passes == (score >= 0.5)
    for r in rows[:50]:
        assert 0.0 <= r["score"] <= 1.0
        assert r["passes"] == (r["score"] >= 0.5)


def test_trained_gate_beats_majority_on_documents(spark):
    """End-to-end on the real corpus: the registry query's trained model
    must beat predicting the majority class (the fixed-weight scorer's
    failure mode when weights are wrong)."""
    from pydatalake_spark.queries.text import quality_classifier_train_q

    row = quality_classifier_train_q(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["accuracy"] > 0.9
    # stopword ratio is the dominant Gopher signal on this corpus
    assert row["w_stop"] > 0.0
