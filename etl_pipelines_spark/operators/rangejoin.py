"""Range / interval join (SURVEY.md §2.4 J9; reference
4_dwh_sustainability/dm_sustainability.v_seasonality.sql:28 joins
dates into [first_monday, first_monday + 7d) windows; 22 files use
non-equi date-range joins).

Spark plans a non-equi join as BroadcastNestedLoopJoin when one side
is small — fine for dimension-sized interval tables (the reference's
case is always a small interval side). For two BIG sides, bucket the
range into a derived equi key first so the join shuffles instead of
looping — ``range_join`` does this automatically when asked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_value: str,
    right_lo: str,
    right_hi: str,
    how: str = "inner",
    broadcast_right: bool = True,
    extra_on: Column | None = None,
) -> DataFrame:
    """left.value in [right.lo, right.hi] (inclusive both ends).

    broadcast_right=True (the default) is the dimension-interval
    case: BNLJ over a broadcast side — O(n·m) but m is tiny.
    """
    cond = (F.col(left_value) >= F.col(right_lo)) & (
        F.col(left_value) <= F.col(right_hi)
    )
    if extra_on is not None:
        cond = cond & extra_on
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, cond, how)


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_value: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Big-big range join: explode each right interval into the
    equi-width buckets it overlaps, equi-join on bucket, re-filter
    the exact range. Turns a nested-loop into one hash shuffle —
    the 100 TB-safe plan when neither side broadcasts."""
    b = F.lit(bucket_width)
    right_b = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / b).cast("long"),
                F.floor(F.col(right_hi) / b).cast("long"),
            )
        ),
    )
    left_b = left.withColumn("__bucket", F.floor(F.col(left_value) / b).cast("long"))
    out = left_b.join(right_b, "__bucket").filter(
        (F.col(left_value) >= F.col(right_lo))
        & (F.col(left_value) <= F.col(right_hi))
    )
    return out.drop("__bucket")
