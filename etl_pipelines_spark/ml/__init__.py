from .batch_scoring import (
    LinearModel,
    load_model,
    one_hot,
    score_expression,
    score_with_pandas,
)

__all__ = [
    "LinearModel",
    "load_model",
    "one_hot",
    "score_expression",
    "score_with_pandas",
]
