"""Exact money aggregation on the fast path: fixed-point cents over
two-tier long/decimal accumulation.

The engine's exactness rule (README) is that 2-decimal money values
aggregate order-independently, which the query layer historically got
from ``sum(col.cast(decimal(12,2)))``. Spark widens every decimal sum
buffer by 10 digits (12,2 -> 22,2), and a >18-digit Decimal leaves the
compact-long representation, so those sums run boxed-Decimal
arithmetic per row — measurably ~2x slower than a native long sum on
a scan-aggregate (TPC-H Q1 shape at sf0.1: 1.2s -> 0.58s).

This module keeps the exactness and the speed with the classic
fixed-point design:

1. Per row, money becomes integer *units* (cents, or 1e-4/1e-6 units
   for 2-decimal products): ``round(col * 100).cast(long)``. A
   2-decimal double times 100 is within 1 ulp of an integer, so the
   round is exact recovery, never a tie.
2. Stage 1 groups by ``(spark_partition_id, *keys)`` — the partial
   aggregation happens map-side inside whole-stage codegen on
   primitive longs. A partial CANNOT overflow: a 128 MiB split holds
   ~10^6-10^7 rows, and unit values are <= ~1e11 (NUMERIC(7,2) money
   squared through a tax*discount product), keeping partials under
   ~1e18 < 2^63.
3. Stage 2 merges the partial rows — ~(groups x input-splits) rows,
   vanishingly small next to the input — summing as decimal(38,0),
   so the MERGE side (where a long could genuinely overflow at
   10^12-row groups) is wide. The extra shuffle carries only partial
   rows and the final exchange is on the group key either way.

Exact-equality argument for the oracle comparison: the unit sum is an
exact integer, ``sum_units / 10^s`` in decimal arithmetic is the exact
rational, and one final cast-to-double rounds once to nearest — the
same single rounding DuckDB performs casting its exact DECIMAL sum,
so both engines emit the identical IEEE double.

Decomposable companions (count/min/max/plain long sums) ride the same
two stages; non-decomposable aggregates (countDistinct, medians) do
not belong here — keep those on the single-stage path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PID = "__ms_pid"


def cents(col: Column, factor: int = 100) -> Column:
    """Exact integer units from a fixed-decimal double (2-decimal ->
    factor 100). Safe because the scaled value is within 1 ulp of an
    integer — round() recovers it exactly, and ties cannot occur."""
    return F.round(col * factor).cast("long")


def two_tier_exact_sums(
    df: DataFrame,
    keys: list[str],
    units: dict[str, tuple[Column, int]],
    partial_extra: dict[str, Column] | None = None,
    merge_extra: dict[str, Column] | None = None,
) -> DataFrame:
    """Grouped exact money sums via long partials + decimal merge.

    ``keys`` must be plain column NAMES: stage 2 groups the stage-1
    output, where an arbitrary Column expression's source columns no
    longer exist (it would rebind or fail). Alias expressions with
    .withColumn before calling.
    ``units``: alias -> (integer-unit column, divisor); the output
    column is ``(SUM(units) :: decimal(38,0)) / divisor :: double``.
    ``partial_extra``: alias -> stage-1 aggregate over input rows
    (count/min/max/sum on longs — must be mergeable by the matching
    ``merge_extra`` entry).
    ``merge_extra``: alias -> stage-2 aggregate over the partial
    columns (referenced by their ``partial_extra`` alias).
    """
    bad = [k for k in keys if not isinstance(k, str)]
    if bad:
        raise TypeError(
            "two_tier_exact_sums keys must be column names (str); got "
            f"{bad!r} — alias expressions with withColumn() first."
        )
    partial_extra = partial_extra or {}
    merge_extra = merge_extra or {}
    p1 = df.groupBy(F.spark_partition_id().alias(_PID), *keys).agg(
        *[F.sum(c).alias(f"__u_{a}") for a, (c, _) in units.items()],
        *[c.alias(a) for a, c in partial_extra.items()],
    )
    return p1.groupBy(*keys).agg(
        *[
            (F.sum(F.col(f"__u_{a}").cast("decimal(38,0)")) / d)
            .cast("double")
            .alias(a)
            for a, (_, d) in units.items()
        ],
        *[c.alias(a) for a, c in merge_extra.items()],
    )
