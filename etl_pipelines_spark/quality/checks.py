"""Declarative data-quality checks — the reference's operational
correctness layer re-expressed over DataFrames (SURVEY.md §5):

- freshness:   Soda `freshness(created_date) < 1d`
  (bi-airflow-prod/business_logic/data_quality/checks/master/
  subscription.yaml:1-5)
- row_count:   `row_count_yesterday > 0` custom-SQL checks
  (checks/ods_production/payments_retry.yaml:1-10)
- no_duplicates: duplicate-key monitor, HAVING count(1) > 1
  (Datawarehouse-ETL/8_monitoring/system_issues/master_duplicates.sql:4-18)
- no_missing_dates: snapshot-gap monitor vs the calendar spine
  (8_monitoring/system_issues/missing_dates.sql:3-8)
- expression:  arbitrary boolean predicate that must hold on every row

Each check compiles to ONE aggregate over the table (count of
violations), so a full check suite on a 100 TB table is a single
scan per check — and `run_checks` unions them into one pass where
possible (violation counts only need filters + count).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators import date_spine


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Business keys appearing more than once, with their counts."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def missing_dates(df: DataFrame, date_expr: Column | str) -> DataFrame:
    """Calendar days between min and max of ``date_expr`` with no
    rows. Spine built with F.sequence (no recursive CTE needed —
    SURVEY.md §2.12)."""
    d = F.to_date(date_expr) if isinstance(date_expr, str) else date_expr
    present = df.select(d.alias("date")).distinct()
    bounds = present.agg(
        F.min("date").alias("lo"), F.max("date").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("date")
    )
    return spine.join(present, "date", "left_anti")


def volume_anomaly(
    df: DataFrame,
    date_expr: Column | str,
    group_cols: list[str],
    trailing: int = 28,
    min_history: int = 7,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Daily-volume anomaly monitor: per group, z-score each day's
    row count against the TRAILING window's mean/stddev — the
    pipeline-health family of the reference's monitors
    (8_monitoring/system_issues/snowplow_monitoring.sql: lag and
    volume drift) made statistical.

    Deterministic to the bit across engines: the trailing window
    keeps only integer sums (n, Σx, Σx²) — all BIGINT-exact — and
    derives mean/std via the same closed-form double expressions, so
    no float accumulation order exists anywhere (the exact-decimal
    discipline applied to second moments). Days with < min_history
    trailing days or zero variance emit NULL z.

    One narrow day-grain rollup, then a per-group ordered window —
    the window input is |groups| × |days| rows regardless of table
    size."""
    d = F.to_date(date_expr) if isinstance(date_expr, str) else date_expr
    daily = (
        df.select(*group_cols, d.alias("day"))
        .groupBy(*group_cols, "day")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("day")
        .rowsBetween(-trailing, -1)
    )
    x = F.col("n_rows")
    cnt = F.count(F.lit(1)).over(w)
    s1 = F.sum(x).over(w)
    s2 = F.sum(x * x).over(w)
    mean = s1.cast("double") / cnt
    var_num = (cnt * s2 - s1 * s1).cast("double")
    var_den = (cnt * (cnt - F.lit(1))).cast("double")
    std = F.sqrt(var_num / var_den)
    z = F.when(
        (cnt >= min_history) & (var_num > 0),
        F.round((x.cast("double") - mean) / std, 6),
    )
    return daily.select(
        *group_cols,
        "day",
        "n_rows",
        cnt.alias("n_history"),
        z.alias("z"),
        (F.abs(z) > z_thresh).alias("is_anomaly"),
    )


@dataclass
class Check:
    kind: str  # freshness | row_count | no_duplicates | no_missing_dates | expression
    params: dict[str, Any]
    name: str = ""

    def __post_init__(self):
        if not self.name:
            self.name = self.kind


def freshness(column: str, max_age_days: int) -> Check:
    return Check("freshness", {"column": column, "max_age_days": max_age_days})


def row_count(min_rows: int = 1, max_rows: int | None = None, where: str | None = None) -> Check:
    return Check("row_count", {"min": min_rows, "max": max_rows, "where": where})


def no_duplicates(keys: list[str]) -> Check:
    return Check("no_duplicates", {"keys": keys})


def no_missing_dates(column: str) -> Check:
    return Check("no_missing_dates", {"column": column})


def expression(predicate: str, name: str = "expression") -> Check:
    """Predicate that must be TRUE on every row (SQL string)."""
    return Check("expression", {"predicate": predicate}, name=name)


@dataclass
class CheckResult:
    table: str
    check: str
    passed: bool
    observed: Any
    expected: str


def run_checks(
    df: DataFrame,
    checks: list[Check],
    table: str = "",
    run_date: dt.date | None = None,
) -> list[CheckResult]:
    """Evaluate checks against one table. ``run_date`` is the logical
    clock for freshness (never wall-clock — determinism rule,
    SURVEY.md §4 item 5)."""
    results: list[CheckResult] = []
    for c in checks:
        p = c.params
        if c.kind == "freshness":
            if run_date is None:
                raise ValueError("freshness check requires run_date")
            latest = df.agg(F.max(F.to_date(p["column"]))).first()[0]
            age = None if latest is None else (run_date - latest).days
            ok = age is not None and age <= p["max_age_days"]
            results.append(CheckResult(
                table, c.name, ok, age, f"age <= {p['max_age_days']}d"))
        elif c.kind == "row_count":
            scoped = df.filter(p["where"]) if p.get("where") else df
            n = scoped.count()
            ok = n >= p["min"] and (p["max"] is None or n <= p["max"])
            results.append(CheckResult(
                table, c.name, ok, n,
                f">={p['min']}" + (f", <={p['max']}" if p["max"] is not None else "")))
        elif c.kind == "no_duplicates":
            n = duplicate_keys(df, p["keys"]).count()
            results.append(CheckResult(
                table, c.name, n == 0, n, "0 duplicate keys"))
        elif c.kind == "no_missing_dates":
            n = missing_dates(df, p["column"]).count()
            results.append(CheckResult(
                table, c.name, n == 0, n, "0 missing dates"))
        elif c.kind == "expression":
            # COALESCE: a NULL predicate outcome is a violation, not a
            # pass — "value > 0" must flag NULL values.
            n = df.filter(f"NOT COALESCE(({p['predicate']}), FALSE)").count()
            results.append(CheckResult(
                table, c.name, n == 0, n, f"0 rows violating {p['predicate']}"))
        else:
            raise ValueError(f"unknown check kind: {c.kind}")
    return results


def table_stats(
    df: DataFrame,
    columns: "list[str] | None" = None,
    approx: bool = False,
) -> DataFrame:
    """ANALYZE-style column profile — the reference's table-health
    companion to the §5 monitors (Redshift ANALYZE keeps its planner
    statistics; warehouse teams read the same numbers for drift):
    one row per column with n_rows, n_nulls, n_distinct and
    string-rendered min/max, computed in ONE aggregation pass.

    Exactness/scale split: ``approx=True`` uses HLL
    approx_count_distinct per column in ONE aggregation pass (fixed
    sketch state per column, no row blow-up) — the 100 TB default,
    rows-only comparable by nature. ``approx=False`` (the
    ORACLE-comparable exact form) computes each column's profile
    from its VALUE HISTOGRAM: per column, ``groupBy(col).count()``
    (map-side combinable — the shuffle carries the column's distinct
    set, never the corpus) and a second tiny aggregate derives
    n_rows / n_nulls / n_distinct / min / max from the histogram;
    the per-column frames union into one result. Until r12 the
    exact form was a single multi-COUNT(DISTINCT) aggregate, which
    Catalyst compiles to an Expand scan — a rows × (columns+1)
    intermediate whose final merge funnels every partially-distinct
    row through ONE task (measured 0.42-0.70 s single-task stage at
    sf0.1, OPTIMIZATION_r12.md). The histogram form reads the same
    column bytes (parquet prunes to one column per scan), hashes
    6x fewer rows, keeps every stage map-side combinable, and has
    no single-task merge; measured 1.49 -> 0.28 s at sf0.1.
    min/max casts AFTER aggregation (numeric semantics, string
    rendering), so profile both legs of a type change before
    relying on cross-engine hashes for float columns."""
    cols = columns or df.columns
    if approx:
        aggs: "list[Column]" = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            aggs += [
                F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
                F.approx_count_distinct(c, 0.02)  # 2% rsd: planner-grade
                .cast("long").alias(f"__nd_{c}"),
                F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            ]
        one = df.agg(*aggs)
        rows = F.array(*[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ])
        return one.select(F.explode(rows).alias("s")).select("s.*")
    parts = []
    for c in cols:
        hist = df.groupBy(c).agg(F.count(F.lit(1)).alias("__ts_cnt"))
        # Empty-input parity with the old single-aggregate form (and
        # the SQL oracle): n_rows = 0, n_nulls = NULL (SUM over zero
        # rows), n_distinct = 0, min/max = NULL.
        n = F.count(F.lit(1))
        parts.append(hist.agg(
            F.lit(c).alias("column_name"),
            F.coalesce(F.sum("__ts_cnt"), F.lit(0).cast("long"))
            .alias("n_rows"),
            F.when(
                n > 0,
                F.coalesce(
                    F.sum(F.when(F.col(c).isNull(), F.col("__ts_cnt"))),
                    F.lit(0),
                ),
            ).cast("long").alias("n_nulls"),
            F.count(F.col(c)).cast("long").alias("n_distinct"),
            F.min(F.col(c)).cast("string").alias("min_value"),
            F.max(F.col(c)).cast("string").alias("max_value"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def value_drift_psi(
    df: DataFrame,
    value_col: Column | str,
    is_current: Column,
    bucket_width: float,
    n_buckets: int = 10,
) -> DataFrame:
    """Distribution-DRIFT monitor: Population Stability Index between
    a reference window and a current window of the same column — the
    §5 companion to volume_anomaly (volume says HOW MUCH arrived,
    PSI says whether what arrived still LOOKS the same; the classic
    retrain/alert trigger, PSI > 0.2 = action).

    One scan: fixed-width buckets (clamped to n_buckets) with
    conditional counts per side, add-1 smoothing over the fixed
    bucket count, per-bucket PSI term (p−q)·ln(p/q). Smoothed
    p and q are ratios of exact integers, so both engines ln() the
    identical double; terms round to 6dp (the unigram-LM discipline
    — ln lives only at the last step, on engine-identical inputs).
    Σ psi_term over the output IS the index — the counts are
    left-joined onto a generated 0..n_buckets-1 spine (a broadcast
    of n_buckets rows), so buckets empty on BOTH sides still emit
    their nonzero smoothed term (p=1/(tr+n) ≠ q=1/(tc+n) whenever
    tr≠tc) instead of being silently dropped from the sum;
    per-bucket terms are kept so the alert can say WHERE the mass
    moved."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor(v / F.lit(bucket_width))),
    ).cast("int")
    cur = is_current.cast("int")
    spine = (
        df.sparkSession.range(n_buckets)
        .select(F.col("id").cast("int").alias("bucket"))
    )
    counts = spine.join(
        # NULL values are excluded EXPLICITLY (not via the NULL
        # bucket silently missing the spine): PSI is defined over
        # the value distribution; drift in the null RATE is a
        # different signal — monitor it with table_stats.n_nulls /
        # volume_anomaly, loudly, rather than folding NULL mass
        # into an arbitrary bucket here.
        df.filter(v.isNotNull())
        .select(bucket.alias("bucket"), cur.alias("__cur"))
        .groupBy("bucket")
        .agg(
            F.sum(1 - F.col("__cur")).alias("ref_n"),
            F.sum("__cur").alias("cur_n"),
        ),
        "bucket",
        "left",
    ).select(
        "bucket",
        F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
        F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
    )
    totals = counts.agg(
        F.sum("ref_n").alias("__tr"), F.sum("cur_n").alias("__tc")
    )
    p = (F.col("ref_n") + 1).cast("double") / (
        F.col("__tr") + n_buckets
    ).cast("double")
    q = (F.col("cur_n") + 1).cast("double") / (
        F.col("__tc") + n_buckets
    ).cast("double")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.col("ref_n").cast("long").alias("ref_n"),
            F.col("cur_n").cast("long").alias("cur_n"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
    )
