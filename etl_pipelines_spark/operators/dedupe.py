"""Window-dedup: THE core idiom of the reference warehouse.

``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ...) = 1`` appears in
397 files / 780 call sites (SURVEY.md §2.6 Wn1; e.g. reference
3_master/customer.sql:57, 30_segment_events/01_track_events.sql:28),
plus the QUALIFY form (1_ods_core/00_allocation.sql:78).

Scale notes: a row_number window over (key) is a single shuffle on
the key — the same shuffle a groupBy would take; no skew concern
beyond what AQE handles, because partitions here are business keys
(customer_id, message_id) with small per-key cardinality. For
top-1-per-key specifically, `max_by`-style aggregation would also
work but loses the full row without struct-packing; the window form
keeps the row and whole-stage-codegens cleanly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cs: Sequence[Column | str]) -> list[Column]:
    return [c if isinstance(c, Column) else F.col(c) for c in cs]


def with_row_number(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
    col_name: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))
    return df.withColumn(col_name, F.row_number().over(w))


def dedupe_latest(
    df: DataFrame,
    keys: Sequence[Column | str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per key: the first under ``order_by``
    (pass descending columns for 'latest'). Ties broken by the order
    columns only — add a unique tiebreaker for full determinism."""
    return (
        with_row_number(df, keys, order_by, "__rn")
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def qualify(
    df: DataFrame,
    window_expr: Column,
    predicate,
) -> DataFrame:
    """Redshift QUALIFY rewrite: attach the window expression, filter
    on it, drop it. ``predicate`` is a fn(Column) -> Column, e.g.
    ``lambda c: c == 1``."""
    tmp = "__qualify"
    return df.withColumn(tmp, window_expr).filter(predicate(F.col(tmp))).drop(tmp)
