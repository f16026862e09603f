from .matview import MaterializedView
from .model import Model, ModelResult, RunContext, TaskGroup
from .pipeline import Pipeline, backfill
from .warehouse import build_warehouse_pipeline

__all__ = [
    "Model",
    "ModelResult",
    "Pipeline",
    "backfill",
    "RunContext",
    "TaskGroup",
    "build_warehouse_pipeline",
]
