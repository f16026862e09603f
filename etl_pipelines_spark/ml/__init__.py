from .batch_scoring import (
    LinearModel,
    load_model,
    one_hot,
    score_expression,
    score_with_pandas,
)
from .trees import (
    TreeEnsemble,
    ensemble_sql,
    load_tree_model,
    make_demo_pricing_model,
    score_trees_pandas,
    score_trees_reference,
)
from .mlp import (
    MLPModel,
    load_mlp,
    make_demo_mlp,
    mlp_sql,
    score_mlp_pandas,
    score_mlp_reference,
)
from .train import (
    feature_standardizer,
    logreg_gradient,
    logreg_train_distributed,
)

__all__ = [
    "LinearModel",
    "load_model",
    "one_hot",
    "score_expression",
    "score_with_pandas",
    "TreeEnsemble",
    "ensemble_sql",
    "load_tree_model",
    "make_demo_pricing_model",
    "score_trees_pandas",
    "score_trees_reference",
    "MLPModel",
    "load_mlp",
    "make_demo_mlp",
    "mlp_sql",
    "score_mlp_pandas",
    "score_mlp_reference",
    "feature_standardizer",
    "logreg_gradient",
    "logreg_train_distributed",
]
