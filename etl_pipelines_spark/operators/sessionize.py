"""Sessionization.

The reference's sessions come pre-labeled by the client SDK and are
just GROUP BY session_id rollups (SURVEY.md §2.10 St4; reference
31_segment_page_view_and_sessions/08_sessions.sql:5-30). We provide
both that rollup shape and the gap-based variant (the idiomatic
Spark bonus): a session starts when the gap to the previous event of
the same user exceeds a threshold — lag + cumulative sum of
session-start flags, two window passes over one shuffle on user_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    session_col: str = "session_seq",
) -> DataFrame:
    """Assign a per-user session sequence number (1, 2, ...) using a
    gap rule. Both windows share the same partitioning (user_col), so
    Catalyst plans ONE shuffle and two in-order window passes.

    For streaming, use F.session_window instead (see streaming/).
    """
    order = [F.col(ts_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (F.col(ts_col).cast("long") - prev_ts.cast("long") > gap_minutes * 60)
    ).cast("long")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(session_col, F.sum(is_new).over(wsum))


def session_rollup(
    df: DataFrame,
    session_keys: list[str],
    ts_col: str = "ts",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """The reference's session rollup (08_sessions.sql:5-30):
    MIN/MAX ts, event count, plus caller-supplied conditional aggs."""
    base = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    return df.groupBy(*session_keys).agg(*(base + (aggs or [])))
