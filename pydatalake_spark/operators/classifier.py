"""Distributed logistic-regression trainer for quality classifiers.

The engine already SCORES documents with a fixed-weight logistic gate
(`queries/text.py:quality_classifier_q` — the CCNet/FineWeb classifier-
filtering stage, documented there as "training is out of engine scope;
swap-in point for trained models"). This module closes that loop: a
full-batch gradient-descent TRAINER whose per-iteration work is one
codegen aggregation pass over the corpus — the same bounded-model-artifact
shape as `operators/semdedup.py:kmeans_step`.

Scale posture (the part that must survive 100 TB):
- The corpus never shuffles. Each iteration is ONE map-side-combinable
  aggregation producing d+2 scalars (d feature-gradient means, the bias
  gradient mean, the row count); only those scalars reach the driver.
- The model (d+1 doubles) folds back into the next iteration's plan as
  LITERALS, so the hot path stays whole-stage codegen — no UDFs, no
  broadcast variables, no Python in the executor loop.
- Feature extraction runs once: the narrow (id, label, d doubles)
  projection is persisted MEMORY_AND_DISK before the iteration loop, so
  N iterations cost N scalar-agg passes over ~40 bytes/row, not N
  tokenize passes over raw text.

Beyond-reference op (no pydala counterpart; the reference's scope is
storage/query — SURVEY §2.9 lists UDF hooks as its only compute
extension point).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def logreg_z(feature_cols: Sequence[str], weights: Sequence[float]) -> Column:
    """Linear score w·x + b as a literal-folded codegen expression.

    ``weights`` is ``[w_0 .. w_{d-1}, bias]`` (bias LAST).
    """
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"need {len(feature_cols)} feature weights + bias, "
            f"got {len(weights)} values"
        )
    z: Column = F.lit(float(weights[-1]))
    for c, w in zip(feature_cols, weights):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def logreg_sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_step(
    features: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    weights: Sequence[float],
    lr: float = 1.0,
) -> list[float]:
    """One full-batch GD step; returns the updated ``[w..., bias]``.

    Gradient of mean log-loss: ``g_j = mean((sigmoid(w·x) - y) * x_j)``,
    bias ``g_b = mean(sigmoid(w·x) - y)``. One aggregation pass; d+1
    scalars cross the exchange (map-side partial averages combine).
    """
    r = logreg_sigmoid(logreg_z(feature_cols, weights)) - F.col(
        label_col
    ).cast("double")
    aggs = [F.avg(r * F.col(c)).alias(f"g_{i}") for i, c in enumerate(feature_cols)]
    aggs.append(F.avg(r).alias("g_bias"))
    row = features.agg(*aggs).collect()[0]
    grads = [row[f"g_{i}"] for i in range(len(feature_cols))] + [row["g_bias"]]
    return [w - lr * g for w, g in zip(weights, grads)]


def logreg_train(
    features: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iters: int = 3,
    lr: float = 1.0,
    init: Sequence[float] | None = None,
    persist: bool = True,
) -> list[float]:
    """Full-batch logistic-regression training from ``init`` (default all
    zeros). Persists the narrow feature projection for the loop and
    unpersists before returning; the returned model is plain floats, so
    callers' plans never depend on the persisted lineage. Pass
    ``persist=False`` when the caller already cached the features
    upstream (avoids a second copy)."""
    cols = [label_col, *feature_cols]
    narrow = features.select(*cols)
    if persist:
        narrow = narrow.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        w = list(init) if init is not None else [0.0] * (len(feature_cols) + 1)
        for _ in range(iters):
            w = logreg_step(narrow, feature_cols, label_col, w, lr=lr)
        return w
    finally:
        if persist:
            narrow.unpersist()


def standardize(
    features: DataFrame, feature_cols: Sequence[str]
) -> tuple[DataFrame, dict[str, tuple[float, float]]]:
    """Z-score the feature columns with POPULATION mean/stddev gathered in
    ONE aggregation pass (2d scalars to the driver), folded back as
    literals so the standardized projection stays codegen. A
    zero-variance feature standardizes to 0.0 (it carries no signal;
    mapping it to 0 keeps its weight at its init instead of producing
    inf/nan). Raw-feature GD on [0,1]-ish text ratios needs O(100)
    iterations to move off the majority class; standardized, ~5 suffice
    — this is what makes an unrolled-SQL oracle of the trainer feasible.
    """
    aggs = []
    for c in feature_cols:
        aggs.append(F.avg(c).alias(f"m_{c}"))
        aggs.append(F.stddev_pop(c).alias(f"s_{c}"))
    row = features.agg(*aggs).collect()[0]
    stats = {c: (row[f"m_{c}"], row[f"s_{c}"]) for c in feature_cols}
    out = features
    for c in feature_cols:
        m, s = stats[c]
        col = (
            (F.col(c) - F.lit(float(m))) / F.lit(float(s))
            if s and s > 0.0
            else F.lit(0.0)
        )
        out = out.withColumn(c, col)
    return out, stats


def logreg_accuracy(
    features: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    weights: Sequence[float],
) -> float:
    """Training accuracy at ``weights`` with the 0.5 decision threshold
    (``z >= 0`` — avoids evaluating the sigmoid)."""
    pred = (logreg_z(feature_cols, weights) >= 0).cast("double")
    hit = (pred == F.col(label_col).cast("double")).cast("double")
    return features.agg(F.avg(hit)).collect()[0][0]


def apply_standardization(
    features: DataFrame,
    stats: dict[str, tuple[float, float]],
) -> DataFrame:
    """Re-apply `standardize`'s collected (mean, stddev_pop) stats to a
    FRESH plan over the same source. Lets a caller train on a persisted
    projection, unpersist it, and still return a fully lazy scoring plan
    that standardizes identically (stats are literals, not lineage)."""
    out = features
    for c, (m, s) in stats.items():
        col = (
            (F.col(c) - F.lit(float(m))) / F.lit(float(s))
            if s and s > 0.0
            else F.lit(0.0)
        )
        out = out.withColumn(c, col)
    return out


def sigmoid(x: float) -> float:
    """Driver-side scalar sigmoid (test/readout convenience)."""
    return 1.0 / (1.0 + math.exp(-x))
