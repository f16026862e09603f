"""MLP (matmul) batch inference (SURVEY.md §2.11, neural shape).

Reference shape (ds-airflow-prod/business_logic/tft_pricing_inference/
inference_model.py): the reference's TFT pricing model is a torch
network pulled from storage and batch-applied to feature frames. The
linear (batch_scoring.py) and tree (trees.py) artifacts prove the
mapInPandas plumbing on those shapes; this module closes the last ML
shape — dense matmul layers with a nonlinearity — with no torch
dependency (none in the container): the artifact is plain weight
lists, evaluated vectorized in numpy.

Exact-reproducibility design (what makes the query oracle-checkable):
- each hidden neuron is bias + Σ_i x_i·W[i][j] accumulated STRICTLY
  left-to-right over the input axis — the same fold order as a SQL
  `+` chain, so a bit-identical feature vector yields bit-identical
  pre-activations (the LSH-signature fold trick, textops/similarity);
- the activation is ReLU: max(0, z) is exact in IEEE double — no
  transcendentals between layers (a sigmoid/tanh MLP would be
  ulp-divergent across libms; the FINAL score may round if ever
  needed, interior layers must not);
- mlp_sql() renders the same weights as literal-cast DOUBLE arithmetic
  (DuckDB bare decimals are DECIMAL — memory rule — so every literal
  is CAST(... AS DOUBLE)), one CTE column per hidden neuron, the
  output as the same left-to-right weighted sum.

At 100 TB scoring is a narrow Arrow map over feature rows — model
broadcast once per executor, no shuffle; identical plan shape to the
reference's real torch inference.
"""

from __future__ import annotations

import json
import random
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


@dataclass
class MLPModel:
    """Two-layer regression MLP: hidden = relu(x·W1 + b1), score =
    hidden·w2 + b2. Weights are plain python floats so the exact same
    values appear in the numpy scorer and the SQL literals."""

    features: list[str]
    w1: list[list[float]]  # (in_dim, hidden)
    b1: list[float]  # (hidden,)
    w2: list[float]  # (hidden,)
    b2: float

    @property
    def hidden(self) -> int:
        return len(self.b1)

    def to_json(self) -> str:
        return json.dumps(
            {
                "features": self.features,
                "w1": self.w1,
                "b1": self.b1,
                "w2": self.w2,
                "b2": self.b2,
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> MLPModel:
        d = json.loads(s)
        return cls(d["features"], d["w1"], d["b1"], d["w2"], d["b2"])


def load_mlp(path: str) -> MLPModel:
    """Artifact-from-storage step (reference pulls a torch state dict)."""
    with open(path) as f:
        return MLPModel.from_json(f.read())


def make_demo_mlp(
    features: list[str], hidden: int = 6, seed: int = 11
) -> MLPModel:
    """Deterministic stand-in for a trained MLP: fixed Gaussian
    weights. The point is the exact evaluation machinery, not the
    fit."""
    rng = random.Random(seed)
    in_dim = len(features)
    w1 = [[rng.gauss(0.0, 0.5) for _ in range(hidden)] for _ in range(in_dim)]
    b1 = [rng.gauss(0.0, 0.1) for _ in range(hidden)]
    w2 = [rng.gauss(0.0, 0.5) for _ in range(hidden)]
    b2 = rng.gauss(0.0, 0.1)
    return MLPModel(list(features), w1, b1, w2, b2)


def score_mlp_pandas(
    df: DataFrame,
    model: MLPModel,
    id_cols: list[str],
    score_col: str = "score",
) -> DataFrame:
    """mapInPandas MLP scoring with SQL-replicable float semantics.

    The dim-axis loops accumulate in the same left-to-right order as
    the SQL `+` chains mlp_sql emits; np.maximum(0, z) == greatest(0,
    z) exactly. Weights travel inside the closure (pickled by VALUE —
    worker-closure rule; no module reference escapes)."""
    feats = list(model.features)
    w1 = [list(r) for r in model.w1]
    b1 = list(model.b1)
    w2 = list(model.w2)
    b2 = model.b2
    out_fields = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in id_cols
    )
    schema = f"{out_fields}, {score_col} double"

    def scorer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        W1 = np.array(w1, dtype=np.float64)  # (in, hid)
        B1 = np.array(b1, dtype=np.float64)
        W2 = np.array(w2, dtype=np.float64)
        for pdf in batches:
            X = np.column_stack(
                [pdf[f].astype("float64").fillna(0.0).to_numpy() for f in feats]
            )
            z = np.tile(B1, (len(pdf), 1))
            for i in range(X.shape[1]):  # fold order = SQL + chain
                z = z + X[:, i : i + 1] * W1[None, i, :]
            h = np.maximum(0.0, z)
            out_v = np.full(len(pdf), b2, dtype=np.float64)
            for j in range(h.shape[1]):  # fold order = SQL + chain
                out_v = out_v + h[:, j] * W2[j]
            out = pdf[id_cols].copy()
            out[score_col] = out_v
            yield out

    return df.mapInPandas(scorer, schema=schema)


def mlp_sql(model: MLPModel, score_col: str = "score") -> tuple[str, str]:
    """Render the artifact as DuckDB SQL: returns (hidden_select,
    output_expr). ``hidden_select`` is a comma-joined list of one
    greatest(...) expression per hidden neuron (aliased __h0..__hN)
    to place in a CTE over the feature relation; ``output_expr`` is
    the weighted left-to-right sum over those aliases. Every literal
    is CAST(repr AS DOUBLE) — bare decimal literals in DuckDB are
    DECIMAL, and a DECIMAL chain folds with different rounding than
    the double chain numpy computes."""

    def lit(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    hidden_exprs = []
    for j in range(model.hidden):
        terms = [lit(model.b1[j])]
        terms += [
            f"{f} * {lit(model.w1[i][j])}" for i, f in enumerate(model.features)
        ]
        hidden_exprs.append(
            f"greatest({lit(0.0)}, {' + '.join(terms)}) AS __h{j}"
        )
    out_terms = [lit(model.b2)] + [
        f"__h{j} * {lit(model.w2[j])}" for j in range(model.hidden)
    ]
    return ",\n    ".join(hidden_exprs), f"{' + '.join(out_terms)} AS {score_col}"


def score_mlp_reference(model: MLPModel, rows: list[dict]) -> list[float]:
    """Pure-python scalar evaluation (driver-side agreement oracle
    for tests): same fold order, no numpy."""
    out = []
    for r in rows:
        hs = []
        for j in range(model.hidden):
            z = model.b1[j]
            for i, f in enumerate(model.features):
                z = z + (r.get(f) or 0.0) * model.w1[i][j]
            hs.append(max(0.0, z))
        v = model.b2
        for j in range(model.hidden):
            v = v + hs[j] * model.w2[j]
        out.append(v)
    return out
