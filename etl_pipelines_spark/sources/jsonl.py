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


def compact_json_with_quarantine(
    spark: SparkSession,
    json_dir: str,
    parquet_dir: str,
    quarantine_dir: str,
    schema: str,
    rename: dict[str, str] | None = None,
) -> "tuple[int, int]":
    """Production-hardened JSONL landing: malformed lines are
    QUARANTINED, not dropped and not fatal (the reference's Firehose
    partitions routinely carry truncated lines at hour boundaries —
    a rewrite that aborts on one bad record re-delivers the whole
    hour; one that silently drops loses data unaccountably).

    Mechanics: PERMISSIVE read against the DECLARED schema with a
    ``_corrupt_record`` rescue column — well-formed rows land as
    parquet, corrupt originals land verbatim (text) in the
    quarantine dir for replay after a parser fix. gzip/zstd inputs
    work unchanged (Spark's text/json sources decompress by
    extension — covered in tests). A declared schema is also the
    100 TB posture: schema inference is a full extra pass over the
    landing zone.

    Returns (rows_landed, rows_quarantined)."""
    raw = (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(json_dir)
    )
    # Spark requires caching/materializing before filtering on the
    # corrupt column alone (referencing only internal columns of a
    # PERMISSIVE scan is disallowed) — cache once, split twice.
    raw = raw.cache()
    good = raw.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    for old, new in (rename or {}).items():
        good = good.withColumnRenamed(old, new)
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("value")
    )
    good.write.mode("overwrite").parquet(parquet_dir)
    bad.write.mode("overwrite").text(quarantine_dir)
    n_good = spark.read.parquet(parquet_dir).count()
    n_bad = spark.read.text(quarantine_dir).count()
    raw.unpersist()
    return n_good, n_bad
