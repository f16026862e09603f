"""Running totals and rolling frames.

The reference computes a running balance with a recursive CTE
(4_dwh_grover_card/Account_balance.sql:17-48) and rolling 7/30-day
averages with ROWS BETWEEN frames (:54-55). The recursive form is a
pure prefix sum — a cumulative window replaces it exactly
(SURVEY.md §2.12a / §7 risk 5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cs: Sequence[Column | str]) -> list[Column]:
    return [c if isinstance(c, Column) else F.col(c) for c in cs]


def running_total(
    df: DataFrame,
    value: Column | str,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
    col_name: str = "running_total",
) -> DataFrame:
    w = (
        Window.partitionBy(*_cols(partition_by))
        .orderBy(*_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = value if isinstance(value, Column) else F.col(value)
    return df.withColumn(col_name, F.sum(v).over(w))


def rolling_agg(
    df: DataFrame,
    value: Column | str,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
    preceding: int,
    agg: str = "avg",
    col_name: str = "rolling",
) -> DataFrame:
    """ROWS BETWEEN <preceding> PRECEDING AND CURRENT ROW frame
    (Account_balance.sql:54-55 uses 6 and 29 for 7/30-day)."""
    w = (
        Window.partitionBy(*_cols(partition_by))
        .orderBy(*_cols(order_by))
        .rowsBetween(-preceding, 0)
    )
    v = value if isinstance(value, Column) else F.col(value)
    fn = getattr(F, agg)
    return df.withColumn(col_name, fn(v).over(w))
