"""JSON-lines ingestion + parquet compaction (SURVEY.md §2.1 S6).

The reference's parquet_rewriter (data-airflow-prod/business_logic/
segment/parquet_rewriter.py:29-97) reads one Firehose hour-partition
of JSON, renames/casts columns to string, writes parquet, then
deletes the JSON with a read-then-swap to avoid ghost reads. In
Spark the whole dance is: read the partition dir, write parquet with
mode=overwrite into the destination partition dir — the commit
protocol handles the swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cast_all_string(df: DataFrame) -> DataFrame:
    """The reference casts every raw column to string before landing
    (parquet_rewriter.py:33 cast_df_as_str); typing happens later in
    SQL with :: casts."""
    return df.select([F.col(c).cast("string").alias(c) for c in df.columns])


def compact_json_hour_partition(
    spark: SparkSession,
    json_dir: str,
    parquet_dir: str,
    rename: dict[str, str] | None = None,
    stringify: bool = True,
) -> int:
    """Read an hour partition of JSON-lines, optionally rename
    columns (the rewriter's `columns_rename` map) and stringify,
    rewrite as parquet. Returns row count landed."""
    df = spark.read.json(json_dir)
    for old, new in (rename or {}).items():
        df = df.withColumnRenamed(old, new)
    if stringify:
        df = cast_all_string(df)
    df.write.mode("overwrite").parquet(parquet_dir)
    return spark.read.parquet(parquet_dir).count()
