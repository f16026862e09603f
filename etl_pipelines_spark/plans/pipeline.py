"""Pipeline runner — the engine's answer to the reference's Airflow
fullload DAG (bi-airflow-prod/dags/pipeline/fullload/
dag_fullload_pipeline.py:43-80): an ordered list of task groups,
each an ordered list of models, executed with per-model retries and
the ``trigger_rule='all_done'`` semantics (later groups still run
after a failure; dag_fullload_pipeline.py:75-76).

Scale note: group order encodes the layer topology (ods → master →
dwh → reporting). Models *within* a layer that don't read each
other are independent — ``parallel_within_group=True`` runs them on
a thread pool; Spark's scheduler interleaves their jobs across the
cluster (FAIR-friendly), which is how a 66-group nightly build keeps
1000 executors busy instead of running one shuffle at a time.
"""

from __future__ import annotations

import time
import traceback
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from .model import Model, ModelResult, RunContext, TaskGroup


@dataclass
class Pipeline:
    name: str
    groups: list[TaskGroup] = field(default_factory=list)
    retries: int = 1
    continue_on_failure: bool = True  # trigger_rule='all_done'
    parallel_within_group: bool = False
    max_parallel: int = 4

    def run(self, ctx: RunContext) -> list[ModelResult]:
        results: list[ModelResult] = []
        failed_any = False
        for group in self.groups:
            if self.parallel_within_group and len(group.models) > 1:
                with ThreadPoolExecutor(max_workers=self.max_parallel) as ex:
                    group_results = list(
                        ex.map(lambda m: self._run_model(m, ctx), group.models)
                    )
            else:
                group_results = [self._run_model(m, ctx) for m in group.models]
            results.extend(group_results)
            if any(r.status == "failed" for r in group_results):
                failed_any = True
                if not self.continue_on_failure:
                    remaining = [
                        m
                        for g in self.groups[self.groups.index(group) + 1 :]
                        for m in g.models
                    ]
                    results.extend(
                        ModelResult(m.name, "skipped", 0.0, 0) for m in remaining
                    )
                    break
        return results

    def _run_model(self, model: Model, ctx: RunContext) -> ModelResult:
        t0 = time.perf_counter()
        last_err: str | None = None
        for attempt in range(1, self.retries + 2):
            try:
                model.materialize(ctx)
                return ModelResult(
                    model.name,
                    "success",
                    round(time.perf_counter() - t0, 3),
                    attempt,
                )
            except Exception:
                last_err = traceback.format_exc(limit=5)
        return ModelResult(
            model.name,
            "failed",
            round(time.perf_counter() - t0, 3),
            self.retries + 1,
            last_err,
        )
