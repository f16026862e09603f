"""Driver-faithful result canonicalization, shared by the local gate
(tools/driver_check.py) and the test suite.

The correctness driver canonicalizes each result by sorting columns by
name and then sorting ROWS through pandas ``sort_values`` over all
columns. pandas factorizes object columns to sort them, so any cell
type it cannot hash — numpy arrays from Spark array<...> columns, maps,
structs — raises ``TypeError: unhashable type``. Round 2's one red
driver row (dd_exact_dup_groups) was exactly this: the query was
value-correct, but its array-typed ``doc_ids`` column crashed the
driver's canonicalizer while the repo's old ``repr()``-based local gate
sailed through. Mirroring the driver's canonicalization here makes that
whole class fail locally, before the driver ever sees it.
"""
from __future__ import annotations

import pandas as pd


def pandas_canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all columns — the driver's
    canonicalization. Raises on pandas-unsortable dtypes (array/map/
    struct cells); callers treat that as a query failure."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
