from .checks import (
    Check,
    CheckResult,
    duplicate_keys,
    expression,
    freshness,
    missing_dates,
    no_duplicates,
    no_missing_dates,
    row_count,
    run_checks,
    table_stats,
    value_drift_psi,
)

__all__ = [
    "Check",
    "CheckResult",
    "duplicate_keys",
    "expression",
    "freshness",
    "missing_dates",
    "no_duplicates",
    "no_missing_dates",
    "row_count",
    "run_checks",
    "table_stats",
    "value_drift_psi",
]
