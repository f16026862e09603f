"""Distributed model TRAINING as a dataflow stage (SURVEY.md §2.11).

The reference trains its churn/price models offline (sklearn fit on a
driver box, pickle to S3 — ds-airflow-prod/business_logic/
churn_prediction/logic.py:14-63) and the warehouse only ever scores.
That works until the training frame itself stops fitting on one box —
the LLM-data-pipeline case (quality classifiers fit over corpus-scale
labeled samples, fasttext-style). This module closes the train side
the same way kmeans_lloyd_distributed closes clustering:

- full-batch gradient descent for L2-regularized logistic regression
  where EACH ITERATION IS ONE JVM-SIDE HASH AGGREGATION: the
  per-row residual (sigmoid(w·x) − y) and its feature products are
  Catalyst expressions (whole-stage codegen, no Python anywhere), and
  the gradient is dim+2 SUMs — map-side combinable, so each round
  moves O(dim × partitions) floats to the driver, never data;
- only the MODEL (dim+1 doubles) ever reaches the driver, exactly
  the k×dim-moment discipline of the k-means trainer;
- optional per-feature standardization (one extra aggregate pass) —
  the thing that makes fixed-step GD actually converge on
  production-scale feature magnitudes — with the scaling folded back
  into the returned weights, so the artifact scores RAW features;
- the result is the existing LinearModel artifact: it plugs straight
  into score_expression / score_with_pandas and the registered
  ml_churn_score path, completing the train -> artifact -> batch
  score lifecycle inside one engine.

Determinism note: partial float sums combine in partition order, so
weights can wobble at the last ulps across cluster layouts — inherent
to parallel float reduction (same caveat as every distributed
trainer). Tests therefore assert convergence properties and
layout-insensitivity at 1e-9 relative, not bit equality; the SCORING
side of the artifact stays bit-exact as before.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .batch_scoring import LinearModel


def _sigmoid_z(features: "list[str]", w: "list[float]", b: float):
    z = F.lit(b)
    for c, wi in zip(features, w):
        z = z + F.lit(wi) * F.coalesce(F.col(c).cast("double"), F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def feature_standardizer(
    df: DataFrame, features: "list[str]"
) -> "tuple[list[float], list[float]]":
    """Per-feature (mean, std) in ONE aggregation pass (Σx, Σx², n —
    the integer-moment pattern of mon_volume_anomaly, float here).
    Zero-variance features get std 1.0 so they pass through GD as
    constants instead of dividing by zero."""
    aggs = []
    for c in features:
        x = F.coalesce(F.col(c).cast("double"), F.lit(0.0))
        aggs += [F.sum(x).alias(f"__s_{c}"), F.sum(x * x).alias(f"__q_{c}")]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs).collect()[0]
    n = float(row["__n"])
    means, stds = [], []
    for c in features:
        m = row[f"__s_{c}"] / n
        var = max(row[f"__q_{c}"] / n - m * m, 0.0)
        means.append(m)
        stds.append(math.sqrt(var) if var > 0 else 1.0)
    return means, stds


def logreg_gradient(
    df: DataFrame,
    features: "list[str]",
    label: str,
    w: "list[float]",
    b: float,
) -> "tuple[list[float], float, float, float]":
    """One full-batch pass: returns (dL/dw, dL/db, mean logloss, n).
    The whole pass is Catalyst expressions feeding dim+2 SUMs — one
    map-side-combinable hash aggregation, no Python, no shuffle of
    feature rows."""
    p = _sigmoid_z(features, w, b)
    y = F.col(label).cast("double")
    r = p - y
    eps = F.lit(1e-12)
    ll = -(
        y * F.log(F.greatest(p, eps))
        + (F.lit(1.0) - y) * F.log(F.greatest(F.lit(1.0) - p, eps))
    )
    aggs = [
        F.sum(
            r * F.coalesce(F.col(c).cast("double"), F.lit(0.0))
        ).alias(f"__g_{c}")
        for c in features
    ]
    row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(r).alias("__gb"),
        F.sum(ll).alias("__loss"),
        *aggs,
    ).collect()[0]
    n = float(row["__n"])
    grad = [row[f"__g_{c}"] / n for c in features]
    return grad, row["__gb"] / n, row["__loss"] / n, n


def logreg_train_distributed(
    df: DataFrame,
    features: "list[str]",
    label: str,
    lr: float = 1.0,
    iters: int = 50,
    l2: float = 0.0,
    standardize: bool = True,
) -> "tuple[LinearModel, list[float]]":
    """Train L2-regularized logistic regression by full-batch GD;
    returns (LinearModel over RAW features, per-iteration mean-
    logloss trace). One aggregation job per iteration (+1 for the
    standardizer); the training frame itself never moves.

    At 100 TB: each iteration is a single scan + partial-aggregated
    reduction of dim+2 doubles per partition — the optimal
    communication pattern for full-batch GD (and the same shape
    parameter servers reduce to for one synchronous step). Cache the
    projected feature frame before calling when iterating many times
    over a wide source table."""
    feats = df.select(
        *[F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c)
          for c in features],
        F.col(label).cast("double").alias(label),
    )
    if standardize:
        means, stds = feature_standardizer(feats, features)
        feats = feats.select(
            *[
                ((F.col(c) - F.lit(m)) / F.lit(s)).alias(c)
                for c, m, s in zip(features, means, stds)
            ],
            label,
        )
    else:
        means = [0.0] * len(features)
        stds = [1.0] * len(features)

    w = [0.0] * len(features)
    b = 0.0
    trace: "list[float]" = []
    for _ in range(iters):
        grad, gb, loss, _n = logreg_gradient(feats, features, label, w, b)
        trace.append(loss + 0.5 * l2 * sum(x * x for x in w))
        w = [wi - lr * (gi + l2 * wi) for wi, gi in zip(w, grad)]
        b = b - lr * gb

    # fold standardization back: w_raw = w/std, b_raw = b - Σ w·mean/std
    w_raw = [wi / s for wi, s in zip(w, stds)]
    b_raw = b - sum(wi * m / s for wi, m, s in zip(w, means, stds))
    return LinearModel(b_raw, dict(zip(features, w_raw))), trace
