"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (master_customer wide-entity
  build) on sf0.001 — smoke check.
- ``queries()``: every implemented operator from SURVEY.md §2 as a
  named (spark, sf_dir) -> DataFrame callable.
- ``oracle_sql()``: matching DuckDB SQL per query (omitted for
  non-SQL-expressible ops -> rows-only check).

Implementation lives in ``etl_pipelines_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Python WORKERS don't see the driver's sys.path — closures over
# package functions (the Arrow-map codecs) unpickle by module
# reference in the worker, so the package must be importable there.
# Exporting PYTHONPATH before the JVM starts covers any launch cwd.
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _REPO
    )

from etl_pipelines_spark import session as _session  # noqa: E402
from etl_pipelines_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _session.configure(spark)
    return REGISTRY["master_customer"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in REGISTRY.items():
        def make(fn):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                _session.configure(spark)
                return fn(spark, sf_dir)
            return run
        out[name] = make(spec.spark)
    return out


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle
    }
