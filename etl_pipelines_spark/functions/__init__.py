"""Redshift-dialect compat layer (SURVEY.md §2.9).

Thin, JVM-side wrappers over ``pyspark.sql.functions`` that reproduce
the scalar-function semantics the reference warehouse actually uses.
Every function here compiles to built-in Catalyst expressions — no
Python UDFs — so the whole layer stays inside whole-stage codegen.

Semantics-risk functions called out in SURVEY.md §4 (DATEDIFF
boundary counting, TO_CHAR format codes, DOW numbering, DECODE,
LISTAGG ordering) each get an explicit implementation + unit tests in
``tests/test_functions.py``.

Reference citation anchors (read-only reference at /root/reference):
- DATEDIFF boundary semantics: Datawarehouse-ETL/3_master/subscription.sql:75-94
- TO_CHAR format codes: 31_segment_page_view_and_sessions/08_sessions.sql:41-54
- JSON_EXTRACT_PATH_TEXT: 30_segment_events/01_track_events.sql:38
- LISTAGG WITHIN GROUP: 1_ods_core/01_order.sql:122
- DECODE: 1_ods_finance/00_subscription_discount_new_infra.sql:75
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


# ---------------------------------------------------------------------------
# Date / time
# ---------------------------------------------------------------------------

_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}

_UNIT_ALIASES = {
    "s": "second", "sec": "second", "secs": "second", "seconds": "second",
    "min": "minute", "mins": "minute", "minutes": "minute",
    "h": "hour", "hr": "hour", "hrs": "hour", "hours": "hour",
    "d": "day", "days": "day",
    "w": "week", "weeks": "week",
    "mon": "month", "mons": "month", "months": "month",
    "qtr": "quarter", "quarters": "quarter",
    "y": "year", "yr": "year", "yrs": "year", "years": "year",
}


def _norm_unit(unit: str) -> str:
    u = unit.strip().strip("'\"").lower()
    return _UNIT_ALIASES.get(u, u)


def datediff(unit: str, start: ColumnOrName, end: ColumnOrName) -> Column:
    """Redshift DATEDIFF: count of *unit boundaries crossed*, not
    elapsed units. ``datediff('year', '2023-12-31', '2024-01-01') = 1``.

    day/week/hour/minute/second: truncate both ends to the unit, then
    exact difference in that unit. month/quarter/year: calendar
    component arithmetic. Weeks start Monday (Redshift DATE_TRUNC).
    """
    unit = _norm_unit(unit)
    s, e = _col(start), _col(end)
    if unit == "day":
        return F.datediff(e, s).cast("long")
    if unit in ("second", "minute", "hour", "week"):
        ts, te = F.date_trunc(unit, s), F.date_trunc(unit, e)
        div = _SECONDS[unit]
        return ((te.cast("long") - ts.cast("long")) / div).cast("long")
    if unit == "month":
        return (
            (F.year(e) - F.year(s)) * 12 + (F.month(e) - F.month(s))
        ).cast("long")
    if unit == "quarter":
        return (
            (F.year(e) - F.year(s)) * 4 + (F.quarter(e) - F.quarter(s))
        ).cast("long")
    if unit == "year":
        return (F.year(e) - F.year(s)).cast("long")
    raise ValueError(f"unsupported datediff unit: {unit!r}")


def dateadd(unit: str, n: int | ColumnOrName, ts: ColumnOrName) -> Column:
    """Redshift DATEADD(unit, n, ts) -> timestamp."""
    unit = _norm_unit(unit)
    t = _col(ts)
    ncol = F.lit(n) if isinstance(n, int) else _col(n)
    if unit == "month":
        return F.add_months(t, ncol).cast("timestamp")
    if unit == "quarter":
        return F.add_months(t, ncol * 3).cast("timestamp")
    if unit == "year":
        return F.add_months(t, ncol * 12).cast("timestamp")
    if unit in _SECONDS:
        # arithmetic on the MICROS value: Redshift DATEADD preserves
        # fractional seconds for second/minute/hour/day/week units —
        # a whole-seconds cast would truncate them.
        micros = F.unix_micros(t.cast("timestamp")) + ncol.cast("long") * (
            _SECONDS[unit] * 1_000_000
        )
        return F.timestamp_micros(micros)
    raise ValueError(f"unsupported dateadd unit: {unit!r}")


def date_trunc(unit: str, ts: ColumnOrName) -> Column:
    """DATE_TRUNC with Redshift unit aliases (week starts Monday —
    same as Spark)."""
    return F.date_trunc(_norm_unit(unit), _col(ts))


def date_part(part: str, ts: ColumnOrName) -> Column:
    """Redshift DATE_PART / EXTRACT. ⚠ DOW numbering: Redshift has
    0=Sunday..6=Saturday; Spark's dayofweek() is 1=Sunday..7=Saturday.
    """
    part = _norm_unit(part)
    t = _col(ts)
    if part in ("dow", "dayofweek", "weekday"):
        return (F.dayofweek(t) - 1).cast("int")
    if part == "doy":
        return F.dayofyear(t)
    if part == "epoch":
        return t.cast("timestamp").cast("long")
    mapping = {
        "year": F.year, "month": F.month, "day": F.dayofmonth,
        "hour": F.hour, "minute": F.minute, "second": F.second,
        "quarter": F.quarter, "week": F.weekofyear,
    }
    if part in mapping:
        return mapping[part](t)
    raise ValueError(f"unsupported date_part: {part!r}")


extract = date_part


def last_day(ts: ColumnOrName) -> Column:
    return F.last_day(_col(ts))


def convert_timezone(src: str, tgt: str, ts: ColumnOrName) -> Column:
    """Redshift CONVERT_TIMEZONE(src, tgt, naive_ts): reinterpret the
    naive timestamp as src-zone wall time and express it in tgt wall
    time (still naive)."""
    return F.from_utc_timestamp(F.to_utc_timestamp(_col(ts), src), tgt)


# TO_CHAR format-code translation (Redshift/Postgres codes -> JVM
# SimpleDateFormat codes used by F.date_format). Longest-match-first.
_TO_CHAR_CODES = [
    ("HH24", "HH"), ("HH12", "hh"), ("MI", "mm"), ("SS", "ss"),
    ("MS", "SSS"), ("YYYY", "yyyy"), ("YYY", "yyy"), ("YY", "yy"),
    ("MONTH", "MMMM"), ("MON", "MMM"), ("MM", "MM"),
    ("DDD", "DDD"), ("DD", "dd"), ("DAY", "EEEE"), ("DY", "EEE"),
    ("HH", "hh"), ("AM", "a"), ("PM", "a"), ("TZ", "zz"), ("Q", "Q"),
]


def _translate_to_char_format(fmt: str) -> tuple[str, bool]:
    """Translate a Redshift TO_CHAR format string to date_format
    codes. Returns (format, needs_dow_digit) — the 'd' code (1=Sunday
    day-of-week digit) has no date_format equivalent and is handled
    separately."""
    out: list[str] = []
    i = 0
    needs_dow = False
    while i < len(fmt):
        ch = fmt[i]
        matched = False
        rest_upper = fmt[i:].upper()
        for code, repl in _TO_CHAR_CODES:
            if rest_upper.startswith(code):
                out.append(repl)
                i += len(code)
                matched = True
                break
        if matched:
            continue
        if ch in ("d", "D") and not rest_upper.startswith("DD"):
            # Redshift 'd' / 'D': day of week 1=Sunday..7
            out.append("\x00")  # placeholder
            needs_dow = True
            i += 1
            continue
        if ch.isalpha():
            # passthrough letters must be quoted for date_format
            out.append(f"'{ch}'")
        else:
            out.append(ch)
        i += 1
    return "".join(out), needs_dow


def to_char(ts: ColumnOrName, fmt: str) -> Column:
    """Redshift TO_CHAR(ts, fmt) for the format codes the reference
    uses (08_sessions.sql:41-54, dim_dates.sql:26,29): YYYY-MM-DD,
    HH24:MI:SS, 'Month', 'Day', 'd', 'Q', 'DDD', etc."""
    translated, needs_dow = _translate_to_char_format(fmt)
    t = _col(ts)
    if not needs_dow:
        return F.date_format(t, translated)
    dow = F.dayofweek(t).cast("string")  # 1=Sunday..7 == Redshift 'd'
    parts = translated.split("\x00")
    cols: list[Column] = []
    for j, p in enumerate(parts):
        if p:
            cols.append(F.date_format(t, p))
        if j < len(parts) - 1:
            cols.append(dow)
    return F.concat(*cols) if len(cols) > 1 else cols[0]


def to_date(s: ColumnOrName, fmt: str | None = None) -> Column:
    return F.to_date(_col(s), fmt) if fmt else F.to_date(_col(s))


def to_timestamp(s: ColumnOrName, fmt: str | None = None) -> Column:
    return F.to_timestamp(_col(s), fmt) if fmt else F.to_timestamp(_col(s))


def trunc_date(ts: ColumnOrName) -> Column:
    """Redshift TRUNC(timestamp) -> date."""
    return F.to_date(_col(ts))


# ---------------------------------------------------------------------------
# String
# ---------------------------------------------------------------------------

def split_part(s: ColumnOrName, delim: str, n: int) -> Column:
    """SPLIT_PART(s, delim, n), 1-based; '' when out of range
    (Redshift semantics; F.split_part matches)."""
    return F.split_part(_col(s), F.lit(delim), F.lit(n))


def charindex(sub: str, s: ColumnOrName) -> Column:
    """CHARINDEX/STRPOS: 1-based position, 0 if absent."""
    return F.locate(sub, _col(s))


position = charindex


def left(s: ColumnOrName, n: int) -> Column:
    return F.substring(_col(s), 1, n)


def right(s: ColumnOrName, n: int) -> Column:
    c = _col(s)
    return F.when(F.length(c) <= n, c).otherwise(
        F.substring(c, -n, n)
    )


def len_(s: ColumnOrName) -> Column:
    return F.length(_col(s))


def btrim(s: ColumnOrName, chars: str | None = None) -> Column:
    c = _col(s)
    return F.trim(c) if chars is None else F.btrim(c, F.lit(chars))


def regexp_substr(s: ColumnOrName, pattern: str, group: int = 0) -> Column:
    """REGEXP_SUBSTR -> first match ('' when no match, like Spark's
    regexp_extract with the full pattern as group 0)."""
    return F.regexp_extract(_col(s), pattern, group)


def regexp_count(s: ColumnOrName, pattern: str) -> Column:
    return F.regexp_count(_col(s), F.lit(pattern))


def similar_to(s: ColumnOrName, pattern: str) -> Column:
    """Redshift SIMILAR TO: SQL regex, implicitly anchored at both
    ends. % -> .*, _ -> . (9_SPV/Pricing/1_pricing_outlier_removal.sql:16)."""
    java = pattern.replace("%", ".*").replace("_", ".")
    return _col(s).rlike(f"^(?:{java})$")


# ---------------------------------------------------------------------------
# JSON / semi-structured
# ---------------------------------------------------------------------------

def json_extract_path_text(s: ColumnOrName, *path: str) -> Column:
    """JSON_EXTRACT_PATH_TEXT(s, k1, k2, ...) -> string value at the
    path, NULL on missing/invalid (the reference always guards with
    IS_VALID_JSON, so NULL-on-invalid is the observed behavior)."""
    jpath = "$." + ".".join(path)
    return F.get_json_object(_col(s), jpath)


def json_extract_array_element_text(s: ColumnOrName, idx: int) -> Column:
    return F.get_json_object(_col(s), f"$[{idx}]")


def json_array_length(s: ColumnOrName) -> Column:
    return F.json_array_length(_col(s))


def is_valid_json(s: ColumnOrName) -> Column:
    """TRUE iff the string parses as a JSON object/array/value."""
    c = _col(s)
    return F.when(c.isNull(), F.lit(False)).otherwise(
        F.try_parse_json(c).isNotNull()
    )


def json_parse(s: ColumnOrName, schema) -> Column:
    """JSON_PARSE -> SUPER becomes from_json -> struct; dot navigation
    c."app"."build" then becomes col('c.app.build')."""
    return F.from_json(_col(s), schema)


def json_serialize(c: ColumnOrName) -> Column:
    return F.to_json(_col(c))


# ---------------------------------------------------------------------------
# Conditional / NULL handling
# ---------------------------------------------------------------------------

def nvl(a: ColumnOrName, b: ColumnOrName) -> Column:
    return F.coalesce(_col(a), _col(b))


def nvl2(a: ColumnOrName, if_not_null, if_null) -> Column:
    return F.when(_col(a).isNotNull(), if_not_null).otherwise(if_null)


def decode(expr: ColumnOrName, *args) -> Column:
    """Oracle/Redshift DECODE(expr, search1, result1, ..., [default]).
    NULL matches NULL (unlike ``=``). NOT Spark's charset F.decode.
    """
    c = _col(expr)
    pairs = list(args)
    default = pairs.pop() if len(pairs) % 2 == 1 else F.lit(None)
    out: Column | None = None
    for i in range(0, len(pairs), 2):
        search, result = pairs[i], pairs[i + 1]
        search_c = search if isinstance(search, Column) else F.lit(search)
        result_c = result if isinstance(result, Column) else F.lit(result)
        cond = c.eqNullSafe(search_c)
        out = F.when(cond, result_c) if out is None else out.when(cond, result_c)
    if out is None:
        return default if isinstance(default, Column) else F.lit(default)
    return out.otherwise(default if isinstance(default, Column) else F.lit(default))


# ---------------------------------------------------------------------------
# Aggregates (dialect forms)
# ---------------------------------------------------------------------------

def listagg(
    value: ColumnOrName,
    sep: str = ",",
    order_by: ColumnOrName | list[ColumnOrName] | None = None,
    distinct: bool = False,
) -> Column:
    """LISTAGG([DISTINCT] value, sep) WITHIN GROUP (ORDER BY keys).

    Deterministic ordering is mandatory (SURVEY.md §7 risk 3):
    collect (value) or (keys..., value) structs, array_sort, then
    join — never bare collect_list. NULL values are dropped (Redshift
    drops them). Use inside .agg(...).
    """
    v = _col(value).cast("string")
    if distinct:
        arr = F.array_sort(F.collect_set(v))
        return F.array_join(arr, sep)
    if order_by is None:
        arr = F.array_sort(F.collect_list(v))
        return F.array_join(arr, sep)
    keys = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    fields = [
        _col(k).alias(f"k{i}") for i, k in enumerate(keys)
    ] + [v.alias("v")]
    pairs = F.array_sort(F.collect_list(F.struct(*fields)))
    return F.array_join(F.transform(pairs, lambda p: p["v"]), sep)


def bool_or(cond: ColumnOrName) -> Column:
    return F.bool_or(_col(cond))


def bool_and(cond: ColumnOrName) -> Column:
    return F.bool_and(_col(cond))


def median(c: ColumnOrName) -> Column:
    return F.median(_col(c))


def percentile_cont(c: ColumnOrName, q: float) -> Column:
    return F.percentile(_col(c), F.lit(q))


# ---------------------------------------------------------------------------
# Math / misc
# ---------------------------------------------------------------------------

def mod(a: ColumnOrName, b) -> Column:
    """Redshift MOD: sign follows the dividend (same as Spark %)."""
    b_c = b if isinstance(b, Column) else F.lit(b)
    return _col(a) % b_c


def to_number(s: ColumnOrName, precision: int = 38, scale: int = 10) -> Column:
    return _col(s).cast(f"decimal({precision},{scale})")


def greatest(*cols: ColumnOrName) -> Column:
    return F.greatest(*[_col(c) for c in cols])


def least(*cols: ColumnOrName) -> Column:
    return F.least(*[_col(c) for c in cols])
