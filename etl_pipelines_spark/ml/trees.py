"""Tree-ensemble batch inference (SURVEY.md §2.11, non-linear shape).

Reference shape (ds-airflow-prod/business_logic/tft_pricing_inference/
inference_model.py, price_elasticity_v1/data_processor.py): feature
engineering in SQL/pandas -> a pickled non-linear model -> batch
predict -> scores written back. The churn path (batch_scoring.py)
proves the mapInPandas plumbing on a logistic artifact; this module
proves it on a NON-linear one — a gradient-boosted-tree-shaped
ensemble — without any sklearn/xgboost dependency (none in the
container): the artifact is a plain JSON tree list, evaluated
vectorized in numpy.

Everything is engineered to be exactly reproducible in SQL, which is
what makes the query oracle-checkable rather than rows-only:
- splits are `feature <= threshold` comparisons (no arithmetic), so a
  bit-identical feature value takes the same branch in any engine;
- the prediction is base + tree_0 + tree_1 + ... summed left to
  right — the same fold order as a SQL `+` chain;
- ensemble_sql() renders the artifact as nested CASE WHEN per tree,
  the exact DuckDB/ANSI equivalent of the numpy traversal.

At 100 TB the scoring stage is a narrow Arrow map over feature rows —
no shuffle, model broadcast once per executor; identical plan shape
to the reference's real (pickled) models.
"""

from __future__ import annotations

import json
import random
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# A tree node is a plain dict:
#   leaf:  {"value": float}
#   split: {"feature": str, "threshold": float, "left": node, "right": node}
# (left = feature <= threshold, right = feature > threshold; NULLs are
# coalesced to 0.0 upstream, mirroring the reference's fillna(0)).


@dataclass
class TreeEnsemble:
    """GBT-shaped regression artifact: base score + additive trees."""

    base: float
    trees: list[dict]
    features: list[str]

    def to_json(self) -> str:
        return json.dumps(
            {"base": self.base, "trees": self.trees, "features": self.features},
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> TreeEnsemble:
        d = json.loads(s)
        return cls(d["base"], d["trees"], d["features"])


def load_tree_model(path: str) -> TreeEnsemble:
    """Artifact-from-storage step (reference pulls a pickle from S3)."""
    with open(path) as f:
        return TreeEnsemble.from_json(f.read())


def make_demo_pricing_model(seed: int = 7, n_trees: int = 6, depth: int = 3) -> TreeEnsemble:
    """Deterministic stand-in for a trained pricing GBT: random but
    fixed splits over the part/lineitem feature ranges. The point is
    the exact evaluation machinery, not the fit."""
    rng = random.Random(seed)
    ranges = {
        "p_size": (1.0, 50.0),
        "p_retailprice": (900.0, 1900.0),
        "qty_sum": (0.0, 1200.0),
        "line_cnt": (0.0, 60.0),
    }
    feats = sorted(ranges)

    def grow(d: int) -> dict:
        if d == 0:
            return {"value": round(rng.uniform(-25.0, 25.0), 4)}
        f = feats[rng.randrange(len(feats))]
        lo, hi = ranges[f]
        return {
            "feature": f,
            "threshold": round(rng.uniform(lo, hi), 4),
            "left": grow(d - 1),
            "right": grow(d - 1),
        }

    return TreeEnsemble(
        base=1000.0, trees=[grow(depth) for _ in range(n_trees)], features=feats
    )


def score_trees_pandas(
    df: DataFrame,
    model: TreeEnsemble,
    id_cols: list[str],
    score_col: str = "score",
) -> DataFrame:
    """Vectorized ensemble scoring in mapInPandas: one boolean-mask
    descent per tree per Arrow batch; the model travels by value in
    the closure (a broadcast would also work — the artifact is KB).

    The closure is self-contained (plain dicts + numpy) so cloudpickle
    serializes it by value; no package import happens on workers."""
    base = model.base
    trees = model.trees
    feat_list = list(model.features)
    out_fields = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in id_cols
    )
    schema = f"{out_fields}, {score_col} double"

    def scorer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def eval_tree(node, cols, idx):
            out = np.zeros(len(idx), dtype=np.float64)
            stack = [(node, idx)]
            while stack:
                nd, sel = stack.pop()
                if len(sel) == 0:
                    continue
                if "value" in nd:
                    out[sel] = nd["value"]
                    continue
                x = cols[nd["feature"]][sel]
                go_left = x <= nd["threshold"]
                stack.append((nd["left"], sel[go_left]))
                stack.append((nd["right"], sel[~go_left]))
            return out

        for pdf in batches:
            cols = {
                f: pdf[f].astype("float64").fillna(0.0).to_numpy()
                for f in feat_list
            }
            idx = np.arange(len(pdf))
            score = np.full(len(pdf), base, dtype=np.float64)
            for t in trees:  # left-to-right fold, matches the SQL chain
                score = score + eval_tree(t, cols, idx)
            out = pdf[id_cols].copy()
            out[score_col] = score
            yield out

    return df.mapInPandas(scorer, schema=schema)


def score_trees_reference(pdf: pd.DataFrame, model: TreeEnsemble) -> np.ndarray:
    """Driver-side scalar reference implementation (row-at-a-time
    recursive descent) — the agreement oracle for tests."""

    def walk(node: dict, row) -> float:
        while "value" not in node:
            v = row[node["feature"]]
            v = 0.0 if pd.isna(v) else float(v)
            node = node["left"] if v <= node["threshold"] else node["right"]
        return node["value"]

    scores = []
    for _, row in pdf.iterrows():
        s = model.base
        for t in model.trees:
            s = s + walk(t, row)
        scores.append(s)
    return np.array(scores, dtype=np.float64)


def _node_sql(node: dict, col_of: dict[str, str]) -> str:
    # CAST every literal to DOUBLE: bare decimal literals type as
    # DECIMAL in DuckDB, and a DECIMAL sum chain is exact where the
    # engine's double chain rounds per step — 1-ulp divergence.
    if "value" in node:
        return f"CAST({node['value']!r} AS DOUBLE)"
    f = col_of[node["feature"]]
    return (
        f"(CASE WHEN COALESCE({f}, CAST(0 AS DOUBLE)) <= "
        f"CAST({node['threshold']!r} AS DOUBLE) "
        f"THEN {_node_sql(node['left'], col_of)} "
        f"ELSE {_node_sql(node['right'], col_of)} END)"
    )


def ensemble_sql(model: TreeEnsemble, col_of: dict[str, str] | None = None) -> str:
    """The ensemble as one SQL expression: base + CASE-tree + ... —
    the exact equivalent of score_trees_pandas (same comparisons,
    same left-to-right double sum, so bit-identical output)."""
    col_of = col_of or {f: f for f in model.features}
    parts = [f"CAST({model.base!r} AS DOUBLE)"] + [
        _node_sql(t, col_of) for t in model.trees
    ]
    return " + ".join(parts)
