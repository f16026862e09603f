"""COPY / UNLOAD equivalents (SURVEY.md §2.1 S4, S5).

Reference shapes:
- COPY: CSV bulk load with delimiter + IGNOREHEADER + explicit
  column list (Datawarehouse-ETL/11_marketing_reporting/
  Affiliate_Automation/affiliate_daisycon_staging.sql:49-52; operator
  wrapper data-airflow-prod/dags/voucherify/voucherify_ingestion.py:
  73-95).
- UNLOAD: export a result as parquet with `PARALLEL OFF
  ALLOWOVERWRITE MAXFILESIZE 2048 MB`
  (4_dwh_risk/sku_market_valuation.sql:146-148).

Spark-first: COPY is a declarative csv read (schema given, never
inferred at scale — inference is an extra full pass) landing via the
atomic writers; UNLOAD is a parquet/csv write where PARALLEL OFF
maps to coalesce(1) and MAXFILESIZE to maxRecordsPerFile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def copy_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    sep: str = ";",
    ignore_header: bool = True,
    columns: list[str] | None = None,
    null_value: str = "",
) -> DataFrame:
    """COPY-shaped CSV load: explicit schema (DDL string or
    StructType), delimiter, IGNOREHEADER 1, optional column-list
    projection. Malformed rows go to `_corrupt_record`-free PERMISSIVE
    nulls, matching COPY's permissive landing into an all-varchar
    staging table."""
    df = (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("header", ignore_header)
        .option("nullValue", null_value)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    if columns:
        df = df.select(*columns)
    return df


def unload(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    parallel: bool = False,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    **options,
) -> None:
    """UNLOAD-shaped export. ``parallel=False`` (the reference's
    PARALLEL OFF) coalesces to a single file — only sane for
    dimension-sized outputs; leave parallel=True for big tables and
    bound file size with ``max_records_per_file`` (the MAXFILESIZE
    analogue)."""
    out = df if parallel else df.coalesce(1)
    w = out.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    for k, v in options.items():
        w = w.option(k, v)
    getattr(w, fmt)(path)
