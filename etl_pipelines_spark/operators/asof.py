"""As-of join: for each left row, the latest right row with
right.ts <= left.ts (optionally within a tolerance), per key.

The reference approximates this with computed-effective-date equi
joins for currency conversion (3_master/subscription.sql:27-36).
A general as-of is implemented here the scale-correct way: union the
two sides tagged by origin, one window pass partitioned by key
ordered by ts carrying the last right-side payload forward, then
filter back to left rows. ONE shuffle on the key, no range-join
explosion, no per-row lookups — this survives 100 TB where a
broadcast-BNLJ range join would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Append the as-of-matched right payload columns to ``left``.

    direction='backward': latest right row with right_ts <= left_ts.
    direction='forward' : earliest right row with right_ts >= left_ts.
    Right-side duplicates at identical (key, ts) resolve to the one
    that sorts last (backward) / first (forward) — pass a pre-deduped
    right side for full determinism.
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in on + [right_ts]]

    lt = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload).alias("s")).schema["s"].dataType
        ).alias("__rpay"),
    )
    rt = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__lrow"),
        F.struct(*right_payload).alias("__rpay"),
    )
    u = lt.unionByName(rt)

    if direction == "backward":
        # right rows sort before left rows at equal ts (a right row AT
        # the left ts matches); carry last non-null payload forward.
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = F.last("__rpay", ignorenulls=True).over(w)
    elif direction == "forward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = F.last("__rpay", ignorenulls=True).over(w)
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    out = (
        u.withColumn("__match", matched)
        .filter(F.col("__is_left") == 1)
        .select(
            F.col("__lrow.*"),
            *[F.col("__match")[p].alias(p) for p in right_payload],
        )
    )
    return out
