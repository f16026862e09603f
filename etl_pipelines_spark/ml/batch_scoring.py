"""ML batch inference as a dataflow stage (SURVEY.md §2.11).

Reference shape (ds-airflow-prod/business_logic/churn_prediction/
logic.py:14-63): SQL feature extraction -> pandas one-hot encoding ->
pickled sklearn model pulled from S3 -> predict_proba -> scores
written back to the warehouse.

Spark-first re-expression:
- feature assembly is plain DataFrame ops (the SQL stage);
- one-hot encoding is declarative: one `F.when` indicator column per
  known category (the category vocabulary is part of the model
  artifact, exactly like sklearn's fitted encoder);
- scoring runs in `mapInPandas` — Arrow-batched, numpy-vectorized,
  model broadcast once per executor, no per-row Python;
- the "model artifact" is a plain dict of weights (stand-in for the
  reference's pickle; swap `load_model` for joblib on a real
  cluster — the container here ships no sklearn).

A linear/logistic model is also pure-SQL expressible, which gives the
oracle-checkable path (`ml_churn_score` in queries.py): mapInPandas
and the expression form must agree bit-for-bit on the same weights.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class LinearModel:
    """Logistic-regression-shaped artifact: intercept + per-feature
    weights; categorical features carry a category->weight map
    (flattened one-hot)."""

    intercept: float
    weights: dict[str, float]
    categorical: dict[str, dict[str, float]] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "intercept": self.intercept,
                "weights": self.weights,
                "categorical": self.categorical,
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> LinearModel:
        d = json.loads(s)
        return cls(d["intercept"], d["weights"], d.get("categorical", {}))


def load_model(path: str) -> LinearModel:
    """The artifact-from-storage step (reference pulls a pickle from
    S3; we load JSON weights — same lifecycle, no sklearn dep)."""
    with open(path) as f:
        return LinearModel.from_json(f.read())


def one_hot(col: str, categories: list[str]) -> list[Column]:
    """Declarative one-hot: an indicator per known category; unseen
    categories contribute nothing (sklearn handle_unknown='ignore')."""
    return [
        F.when(F.col(col) == c, F.lit(1.0)).otherwise(F.lit(0.0))
        .alias(f"{col}__{c}")
        for c in categories
    ]


def score_expression(model: LinearModel) -> Column:
    """The model as a single Catalyst expression:
    sigmoid(intercept + Σ w_i * x_i + Σ w_cat[c] * [x == c]).
    NULL numeric features are treated as 0 (the reference fillna(0)s
    before predict)."""
    z: Column = F.lit(model.intercept)
    for feat, w in sorted(model.weights.items()):
        z = z + F.lit(w) * F.coalesce(F.col(feat).cast("double"), F.lit(0.0))
    for feat, cats in sorted(model.categorical.items()):
        for c, w in sorted(cats.items()):
            z = z + F.when(F.col(feat) == c, F.lit(w)).otherwise(F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_with_pandas(
    df: DataFrame,
    model: LinearModel,
    id_cols: list[str],
    score_col: str = "score",
) -> DataFrame:
    """mapInPandas scoring — the shape a real (non-linear) sklearn /
    torch model needs: Arrow batches in, numpy math, batches out.
    For this linear artifact it agrees with score_expression to
    float ulp (libm vs JVM exp; tested at 1e-12), proving the
    plumbing is lossless."""
    feats = sorted(model.weights)
    cat_feats = sorted(model.categorical)
    out_fields = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in id_cols
    )
    schema = f"{out_fields}, {score_col} double"

    def scorer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            z = pd.Series(model.intercept, index=pdf.index, dtype="float64")
            for f_ in feats:
                z = z + model.weights[f_] * pdf[f_].astype("float64").fillna(0.0)
            for f_ in cat_feats:
                w = pdf[f_].map(model.categorical[f_]).fillna(0.0).astype("float64")
                z = z + w
            out = pdf[id_cols].copy()
            out[score_col] = 1.0 / (1.0 + np.exp(-z.to_numpy()))
            yield out

    return df.mapInPandas(scorer, schema=schema)
