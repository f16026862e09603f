"""SCD type-2 history merge (slowly changing dimensions).

The reference keeps entity history as full daily snapshots
(5_master_historical/subscription_historical.sql:2-110 — one complete
copy per day, keyed by `date`), which answers "state as of day D" at
the cost of storing the whole entity every day. The interval form
here — (valid_from, valid_to] rows, open row has valid_to NULL — is
the equivalent a warehouse user migrating off that pattern expects:
same point-in-time answers, storage proportional to CHANGES.

Pure DataFrame composition, one merge per run:
- change detection compares the open row's tracked attributes with
  the incoming snapshot via null-safe equality (eqNullSafe — NULL ==
  NULL is "unchanged", the semantics a snapshot diff needs);
- changed/new keys open a new row effective `run_date`; the replaced
  rows close with valid_to = run_date;
- unchanged open rows and already-closed history pass through
  untouched;
- re-running the same run_date is idempotent, and a same-day re-run
  with DIFFERENT attribute values replaces the day's open row IN
  PLACE (last-write-wins per day) — closing it instead would mint a
  zero-length (valid_from == valid_to] interval that as_of() can
  never see.

Scale: one shuffle on the business key joins open rows to the
incoming snapshot; closed history is filtered out before the join
(it can never change), so a 100 TB history table contributes only
its open fraction to the merge. The history write is an upsert at
(keys, valid_from) grain — only touched rows rewrite.
"""

from __future__ import annotations

import datetime as dt
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_FROM = "valid_from"
VALID_TO = "valid_to"


def open_rows(history: DataFrame) -> DataFrame:
    """Current state: the one open interval per key."""
    return history.filter(F.col(VALID_TO).isNull())


def as_of(history: DataFrame, date: dt.date | str) -> DataFrame:
    """Point-in-time view — the snapshot table's "WHERE date = D"."""
    d = F.lit(str(date)).cast("date")
    return history.filter(
        (F.col(VALID_FROM) <= d)
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > d))
    ).drop(VALID_FROM, VALID_TO)


def scd2_merge(
    history: DataFrame | None,
    incoming: DataFrame,
    keys: list[str],
    attrs: list[str],
    run_date: dt.date | str,
) -> DataFrame:
    """Merge one incoming snapshot into an interval history.

    ``history``: existing SCD2 table with keys + attrs + valid_from/
    valid_to (None bootstraps an empty history). ``incoming``: the
    day's full snapshot (keys + attrs). Keys absent from ``incoming``
    keep their open row (the reference's snapshots likewise carry
    entities forward; pass an explicit tombstone row to close one).
    Returns the new history DataFrame.
    """
    d = F.lit(str(run_date)).cast("date")
    inc = incoming.select(*keys, *attrs)

    if history is None:
        return inc.withColumn(VALID_FROM, d).withColumn(
            VALID_TO, F.lit(None).cast("date")
        )

    closed = history.filter(F.col(VALID_TO).isNotNull())
    current = open_rows(history)

    inc_a = inc.select(
        *keys,
        *[F.col(a).alias(f"__new_{a}") for a in attrs],
        # presence marker robust to all-NULL attr rows
        F.lit(True).alias("__in_inc"),
    )
    joined = current.join(inc_a, keys, "full_outer")
    has_open = F.col(VALID_FROM).isNotNull()
    unchanged = reduce(
        lambda x, y: x & y,
        [F.col(a).eqNullSafe(F.col(f"__new_{a}")) for a in attrs],
    )
    is_change = has_open & F.col("__in_inc").isNotNull() & ~unchanged
    is_new_key = ~has_open & F.col("__in_inc").isNotNull()

    # rows that survive as-is: open + (not incoming, or unchanged)
    keep_open = joined.filter(
        has_open & (F.col("__in_inc").isNull() | unchanged)
    ).select(*keys, *attrs, VALID_FROM, VALID_TO)
    # close the replaced versions — EXCEPT rows opened this same
    # run_date: those are replaced in place (last-write-wins per day);
    # closing them would create a zero-length interval invisible to
    # as_of() for every date.
    close_old = joined.filter(is_change & (F.col(VALID_FROM) < d)).select(
        *keys, *attrs, VALID_FROM, d.alias(VALID_TO)
    )
    # open the new versions (changed keys + brand-new keys)
    open_new = joined.filter(is_change | is_new_key).select(
        *keys,
        *[F.col(f"__new_{a}").alias(a) for a in attrs],
        d.alias(VALID_FROM),
        F.lit(None).cast("date").alias(VALID_TO),
    )
    return closed.unionByName(keep_open).unionByName(close_old).unionByName(
        open_new
    )
