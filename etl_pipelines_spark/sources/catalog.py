"""Lightweight name -> storage-location catalog.

Plays the role of Redshift's schema.table namespace + the Glue
catalog for Spectrum external tables (SURVEY.md §1.3). Tables are
partitioned-parquet directories; partition registration is free via
Spark partition discovery (the reference needed an Airflow DAG for
it — data-airflow-prod/dags/kinesis_events/partitions_handler.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    """Resolve logical table names (``schema.table``) to parquet
    directories rooted at ``root``; register them as temp views so
    models can mix DataFrame API and spark.sql freely."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, name: str) -> str:
        return os.path.join(self.root, *name.split("."))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def read_file(self, path: str) -> DataFrame:
        """Read a single driver-provided parquet file (testdata)."""
        return self.spark.read.parquet(path)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f.startswith("part-") or "=" in f
            for f in os.listdir(p)
        )

    def register(self, name: str, view_name: str | None = None) -> None:
        view = view_name or name.replace(".", "__")
        self.read(name).createOrReplaceTempView(view)

    def register_sf_dir(self, sf_dir: str, tables: list[str] | None = None) -> None:
        """Register the driver's testdata tables as temp views."""
        names = tables or [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]
        for t in names:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                self.spark.read.parquet(p).createOrReplaceTempView(t)
