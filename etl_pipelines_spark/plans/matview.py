"""Materialized views with explicit refresh (SURVEY.md §1.1 item 6).

Reference: the 2 materialized views in the warehouse —
`13_finance_reporting/Luxco_Reporting/Price Collection Views/
staging_price_collection.ods_amazon.sql:3` (CREATE MATERIALIZED VIEW)
refreshed explicitly by `13_finance_reporting/Luxco_Reporting/
SPV-Union source.sql:1-2` (REFRESH MATERIALIZED VIEW).

Semantics reproduced here:
- ensure(): CREATE MATERIALIZED VIEW IF NOT EXISTS — build once and
  persist; subsequent ensure() calls are no-ops.
- read(): always serves the PERSISTED result — deliberately stale
  after the sources change, exactly like an unrefreshed Redshift MV.
- refresh(): REFRESH MATERIALIZED VIEW — full recompute + atomic
  swap (Redshift's recompute path; we never claim incremental
  refresh, which Redshift also falls back from for non-trivial
  queries).

At scale the refresh is just a full_refresh write of the view query's
result — the view body is an arbitrary DataFrame build, so Catalyst
plans it like any model; storage is one atomic-swap parquet table.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..sources import writers
from .model import RunContext


@dataclass
class MaterializedView:
    """One persisted view: name, build query, optional layout."""

    name: str  # "schema.view_name"
    build: Callable[[RunContext], DataFrame]
    partition_by: list[str] | None = None

    def _path(self, ctx: RunContext) -> str:
        return ctx.catalog.path(self.name)

    def exists(self, ctx: RunContext) -> bool:
        return os.path.exists(self._path(ctx))

    def ensure(self, ctx: RunContext) -> bool:
        """CREATE MATERIALIZED VIEW IF NOT EXISTS: build + persist on
        first call, no-op afterwards. Returns True if it built."""
        if self.exists(ctx):
            return False
        self.refresh(ctx)
        return True

    def refresh(self, ctx: RunContext) -> None:
        """REFRESH MATERIALIZED VIEW: full recompute, atomic swap."""
        path = self._path(ctx)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        writers.full_refresh(self.build(ctx), path, self.partition_by)

    def read(self, ctx: RunContext) -> DataFrame:
        """Serve the persisted (possibly stale) result; raises if the
        view was never built — same as querying a missing MV."""
        if not self.exists(ctx):
            raise FileNotFoundError(
                f"materialized view {self.name} has not been built; "
                "call ensure() or refresh() first"
            )
        return ctx.catalog.read(self.name)
