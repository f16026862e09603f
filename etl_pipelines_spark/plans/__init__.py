from .matview import MaterializedView
from .model import Model, ModelResult, RunContext, TaskGroup
from .pipeline import Pipeline
from .warehouse import build_warehouse_pipeline

__all__ = [
    "Model",
    "ModelResult",
    "Pipeline",
    "RunContext",
    "TaskGroup",
    "build_warehouse_pipeline",
]
