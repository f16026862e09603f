"""Skew mitigation: salting for hot keys (SURVEY.md §7 risk 4).

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on by
default in session.py) handles most production skew transparently —
these utilities are for the two cases AQE can't fix:

1. skewed AGGREGATION (one key owns half the table): two-phase
   salted aggregate — partial agg on (key, salt), final agg on key.
   Works for any algebraic aggregate (sum/count/min/max).
2. skewed LARGE-LARGE JOIN where one side's hot keys would overflow
   a task even after AQE splitting: replicate the small(er) side
   `salt` times and scatter the big side across replicas.

Both are deterministic: the scatter salt is a hash of the row, not
rand(), so retried tasks produce identical output (Spark task
retries would otherwise see different rand() draws).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _scatter_salt(df: DataFrame, n: int) -> Column:
    """Deterministic per-row salt in [0, n): hash of all columns.
    (Duplicate rows land in the same bucket — harmless: salting needs
    roughly-uniform spread, not perfect.)"""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt: int = 32,
) -> DataFrame:
    """Two-phase aggregate for skewed keys. ``aggs`` maps output
    column -> 'fn(col)' where fn ∈ sum/count/min/max (algebraic:
    partial results merge with the same fn, except count→sum).

    Phase 1 shuffles on (keys, salt) — the hot key spreads over
    `salt` reducers; phase 2 shuffles `salt`× fewer rows per key.
    """
    partial = df.groupBy(
        *keys, _scatter_salt(df, salt).alias(SALT)
    ).agg(*[F.expr(expr).alias(out) for out, expr in aggs.items()])

    def merge(out: str, expr: str) -> Column:
        fn = expr.split("(")[0].strip().lower()
        if fn not in {"sum", "count", "min", "max"}:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
        mfn = "sum" if fn == "count" else fn
        return F.expr(f"{mfn}({out})").alias(out)

    return partial.groupBy(*keys).agg(
        *[merge(out, expr) for out, expr in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skewed equi-join: scatter `big` rows into `salt` sub-buckets,
    replicate `small` across all buckets, join on keys+salt. Use when
    the hot key's rows exceed one task's memory even after AQE
    splitting; `salt` multiplies the small side's shuffle volume, so
    keep it minimal (8-32).

    Only joins that never emit unmatched SMALL-side rows are valid:
    the small side is replicated `salt` times, so right/full outer
    would emit up to `salt` null-padded duplicates for each small row
    whose key misses a salt bucket. Flip the join around (big side
    first) instead of asking for right/full here.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): replicate-small-side salting is "
            "only correct for inner/left/semi/anti joins from the big "
            "side; swap the inputs instead of using right/full."
        )
    big_s = big.withColumn(SALT, _scatter_salt(big, salt))
    small_s = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, on + [SALT], how)
    return out.drop(SALT)
