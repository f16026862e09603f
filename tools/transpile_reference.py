"""Parse-validation sweep: transpile every reference SQL file and
check the result against Spark's SQL parser.

For each ``*.sql`` under the reference tree: split into statements,
``compat.transpile`` each, then ``sessionState.sqlParser.parsePlan``
the output (parse-only -- the reference's table catalog does not
exist here, so analysis cannot run; syntax coverage is the honest
claim). Also inventories every function name called across the
transpiled corpus and buckets it as spark-native / compat-UDF /
unknown, since unknown functions parse fine but would fail at
analysis.

Writes TRANSPILE_COVERAGE.json:
  {"files": N, "files_ok": N, "statements": N, "statements_ok": N,
   "parse_failures": [...sampled...], "transpile_failures": [...],
   "functions": {"native": N, "compat": N,
                 "unknown": {name: count, ...}}}

Usage: python tools/transpile_reference.py [ref_dir] [out_json]
"""
from __future__ import annotations

import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from etl_pipelines_spark.compat import transpile  # noqa: E402
from etl_pipelines_spark.compat.transpile import (  # noqa: E402
    TranspileError,
    split_statements,
    tokenize,
    _is_sig,
)

# statement heads we skip rather than parse: Redshift maintenance /
# permission DDL with no Spark equivalent and no query content.
_SKIP_HEADS = {
    "GRANT", "REVOKE", "VACUUM", "ANALYZE", "COMMIT", "BEGIN", "END",
    "ROLLBACK", "UNLOAD", "COPY", "CALL", "ALTER",
}


def _stmt_head(stmt: str) -> str:
    for tok in tokenize(stmt):
        if _is_sig(tok) and tok.kind == "word":
            return tok.text.upper()
    return ""


_NOT_CALL_PREFIX = {"TABLE", "VIEW", "INTO", "EXISTS", "FUNCTION", "AS"}


def _called_functions(sql: str) -> set[str]:
    toks = [t for t in tokenize(sql) if _is_sig(t)]
    out = set()
    for i in range(len(toks) - 1):
        if (
            toks[i].kind == "word"
            and toks[i + 1].kind == "punct"
            and toks[i + 1].text == "("
        ):
            # a "name(" right after TABLE/VIEW/INTO/"." is DDL or a
            # column list, not a call
            if i > 0 and (
                (toks[i - 1].kind == "punct" and toks[i - 1].text == ".")
                or (
                    toks[i - 1].kind == "word"
                    and toks[i - 1].text.upper() in _NOT_CALL_PREFIX
                )
            ):
                continue
            out.add(toks[i].text.lower())
    return out


_SQL_KEYWORDS = {
    "select", "from", "where", "and", "or", "not", "in", "exists",
    "case", "when", "then", "else", "end", "on", "join", "as", "by",
    "group", "order", "having", "union", "all", "distinct", "over",
    "partition", "between", "like", "ilike", "is", "null", "values",
    "insert", "into", "update", "set", "delete", "create", "table",
    "view", "with", "using", "rlike", "interval", "cast", "filter",
    "within", "rows", "range", "unbounded", "preceding", "following",
    "current", "row", "if", "returns", "return", "except", "minus",
    "varchar", "decimal", "numeric", "char",
}


def main() -> None:
    ref = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
    out_path = sys.argv[2] if len(sys.argv) > 2 else "TRANSPILE_COVERAGE.json"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.doubleQuotedIdentifiers", "true")
        .getOrCreate()
    )
    parser = spark._jsparkSession.sessionState().sqlParser()
    native = {
        f.name.lower() for f in spark.catalog.listFunctions()
    }
    compat_udfs = {
        "charindex", "strpos", "is_valid_json", "json_array_length_rs",
        "isnumeric", "is_valid_json_array", "f_json_ok", "timezone",
        "convert_to_utc_timestamp", "date_part_year", "func_sha1",
        "get_array_length",
    }

    files = sorted(p for p in ref.rglob("*.sql") if p.is_file())
    n_files_ok = 0
    n_stmts = n_stmts_ok = 0
    parse_failures: list[dict] = []
    transpile_failures: list[dict] = []
    fail_buckets: dict[str, int] = {}
    fn_native = fn_compat = 0
    fn_unknown: dict[str, int] = {}
    templated = 0

    for path in files:
        text = path.read_text(errors="replace")
        has_control_jinja = "{%" in text
        if has_control_jinja:
            templated += 1
        file_ok = True
        for stmt in split_statements(text):
            head = _stmt_head(stmt)
            if head in _SKIP_HEADS or not head:
                continue
            n_stmts += 1
            try:
                t = transpile(stmt)
            except TranspileError as e:
                file_ok = False
                key = "transpile: " + str(e)[:60]
                fail_buckets[key] = fail_buckets.get(key, 0) + 1
                if len(transpile_failures) < 40:
                    transpile_failures.append(
                        {"file": str(path.relative_to(ref)),
                         "err": str(e)[:200]}
                    )
                continue
            try:
                parser.parsePlan(t)
                n_stmts_ok += 1
            except Exception as e:  # noqa: BLE001
                file_ok = False
                first = str(e).splitlines()
                msg = next((ln for ln in first if ln.strip()), "")
                m = re.match(r"\[([A-Z_.]+)\]", msg)
                key = "parse: " + (m.group(1) if m else msg[:60])
                fail_buckets[key] = fail_buckets.get(key, 0) + 1
                if len(parse_failures) < 40:
                    parse_failures.append(
                        {"file": str(path.relative_to(ref)),
                         "head": head, "err": msg[:200]}
                    )
                continue
            for fn in _called_functions(t):
                if fn in _SQL_KEYWORDS:
                    continue
                if fn in native:
                    fn_native += 1
                elif fn in compat_udfs:
                    fn_compat += 1
                else:
                    fn_unknown[fn] = fn_unknown.get(fn, 0) + 1
        if file_ok:
            n_files_ok += 1

    result = {
        "files": len(files),
        "files_ok": n_files_ok,
        "files_with_jinja_control": templated,
        "statements": n_stmts,
        "statements_ok": n_stmts_ok,
        "failure_buckets": dict(
            sorted(fail_buckets.items(), key=lambda kv: -kv[1])
        ),
        "parse_failures_sample": parse_failures,
        "transpile_failures_sample": transpile_failures,
        "functions": {
            "native_calls": fn_native,
            "compat_udf_calls": fn_compat,
            "unknown": dict(
                sorted(fn_unknown.items(), key=lambda kv: -kv[1])[:40]
            ),
        },
    }
    pathlib.Path(out_path).write_text(json.dumps(result, indent=1))
    print(json.dumps({
        "files": len(files), "files_ok": n_files_ok,
        "statements": n_stmts, "statements_ok": n_stmts_ok,
    }))


if __name__ == "__main__":
    main()
