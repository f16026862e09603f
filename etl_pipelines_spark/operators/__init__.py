"""Operator library: the reference's recurring relational idioms as
reusable, scale-aware DataFrame transforms (SURVEY.md §2.3-2.8).

Every operator is a pure DataFrame -> DataFrame function built from
Catalyst-native expressions; physical strategy (broadcast vs SMJ,
skew handling) is left to Catalyst/AQE except where an explicit hint
is the right call at 100 TB (documented per function).
"""

from .dedupe import dedupe_latest, with_row_number, qualify
from .topk import top_k_per_group
from .datespine import date_spine, dim_dates
from .sessionize import sessionize
from .asof import asof_join
from .rangejoin import range_join
from .running import running_total, rolling_agg
from .bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prefilter_join,
    bloom_word_table,
)
from .cms import cms_estimate, cms_table
from .hll import hll_distinct, hll_distinct_oracle_sql
from .skew import salted_agg, salted_join
from .moneysum import cents, two_tier_exact_sums
from .scd2 import as_of, open_rows, scd2_merge

__all__ = [
    "cents",
    "two_tier_exact_sums",
    "salted_agg",
    "salted_join",
    "hll_distinct",
    "hll_distinct_oracle_sql",
    "bloom_build",
    "bloom_might_contain",
    "bloom_prefilter_join",
    "bloom_word_table",
    "cms_estimate",
    "cms_table",
    "dedupe_latest",
    "with_row_number",
    "qualify",
    "top_k_per_group",
    "date_spine",
    "dim_dates",
    "sessionize",
    "asof_join",
    "range_join",
    "running_total",
    "rolling_agg",
    "scd2_merge",
    "open_rows",
    "as_of",
]
