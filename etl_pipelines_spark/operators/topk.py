"""Top-k-per-group (SURVEY.md §2.7 O2 — the reference never uses
LIMIT for this; always rank-filter, e.g. reference
5_dwh_widgets/toptenproducts/toptenproducts_v2.sql:54-61)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
    k: int,
    method: str = "row_number",
) -> DataFrame:
    """Rank rows within each group and keep the top k.

    method: 'row_number' (exactly k), 'rank' or 'dense_rank'
    (ties kept). Single shuffle on the group key; at 100 TB with hot
    groups, pre-aggregate or AQE-skew handles it — row_number windows
    never buffer the partition (streaming frame).
    """
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    w = Window.partitionBy(
        *[c if isinstance(c, Column) else F.col(c) for c in partition_by]
    ).orderBy(*[c if isinstance(c, Column) else F.col(c) for c in order_by])
    return df.withColumn("__rk", fn().over(w)).filter(F.col("__rk") <= k).drop("__rk")
