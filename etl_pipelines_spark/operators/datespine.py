"""Date-spine / calendar dimension.

The reference builds dim_dates with a recursive CTE + EXTRACT flags
(bi-airflow-prod/dags/dim_dates/sql/dim_dates.sql:3-44) and uses
CROSS JOIN date-spine × entities for gap-filling
(1_ods_core/00_asset_payments_new_infra.sql:39). Spark expresses the
spine as sequence() + explode — no recursion needed (SURVEY.md §2.12).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def date_spine(
    spark: SparkSession,
    start: str | dt.date,
    end: str | dt.date,
    col_name: str = "date",
) -> DataFrame:
    """One row per day in [start, end] (inclusive). A one-row
    sequence exploded — trivially broadcastable for spine × entity
    cross joins at any scale."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(str(start)).cast("date"),
                F.lit(str(end)).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias(col_name)
    )


def dim_dates(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Calendar dimension with the flag set the reference derives
    (dim_dates.sql:17-44): year/month/day parts, week, quarter,
    weekday index (Redshift DOW: 0=Sunday), first/last-of-month."""
    d = F.col("date")
    return date_spine(spark, start, end).select(
        d,
        F.year(d).alias("year"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day"),
        F.quarter(d).alias("quarter"),
        F.weekofyear(d).alias("week_of_year"),
        (F.dayofweek(d) - 1).alias("day_of_week"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.date_trunc("month", d).cast("date").alias("first_of_month"),
        F.last_day(d).alias("last_of_month"),
        (F.dayofweek(d).isin(1, 7)).alias("is_weekend"),
    )
