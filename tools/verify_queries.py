"""Local stand-in for the driver's correctness gate.

Runs every REGISTRY query on Spark and its oracle on DuckDB at the
given sf dir, compares row count, column names (sorted), and values
(rows sorted, exact equality; floats compared bit-exactly with a
reported max-abs-diff fallback so near-misses are visible).

Usage: python tools/verify_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from etl_pipelines_spark.queries import REGISTRY, load  # noqa: E402
from etl_pipelines_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _sortkey(row):
    return tuple(
        (v is None, str(type(v)), repr(v)) for v in row
    )


def compare(name, spark_df, con, oracle):
    """Python-native comparison: Spark collect() vs DuckDB fetchall(),
    columns sorted by name, rows sorted by repr — mirrors a
    representation-agnostic hash the way the driver compares."""
    problems = []
    scols = sorted(spark_df.columns)
    srows = [tuple(r[c] for c in scols) for r in spark_df.collect()]
    ores = con.execute(oracle)
    ocols_desc = [d[0] for d in ores.description]
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols_desc):
        problems.append(f"schema spark={scols} oracle={sorted(ocols_desc)}")
        return problems
    idx = {c.lower(): i for i, c in enumerate(ocols_desc)}
    orows = [tuple(r[idx[c.lower()]] for c in scols) for r in ores.fetchall()]
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        return problems
    srows.sort(key=_sortkey)
    orows.sort(key=_sortkey)
    max_float_diff = 0.0
    n_mismatch = 0
    example = None
    for i, (sr, orow) in enumerate(zip(srows, orows)):
        for j, (a, b) in enumerate(zip(sr, orow)):
            if a is None and b is None:
                continue
            bad = a != b
            if bad and isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    bad = False
                else:
                    max_float_diff = max(max_float_diff, abs(a - b))
            if bad:
                n_mismatch += 1
                if example is None:
                    example = (scols[j], i, a, b)
    if n_mismatch:
        problems.append(
            f"{n_mismatch} cell mismatches, max_float_diff={max_float_diff:.3e}, first={example}"
        )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = n_noorc = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            df = spec.spark(spark, sf_dir)
            if spec.oracle is None:
                cnt = df.count()
                print(f"  ~ {name}: rows-only, {cnt} rows")
                n_noorc += 1
                continue
            problems = compare(name, df, con, spec.oracle)
            if problems:
                print(f"  ✗ {name}: {'; '.join(problems)}")
                n_fail += 1
            elif df.count() == 0:
                # a 0=0 match proves nothing — a query whose oracle
                # agrees on the empty set is a FAILING check here
                # (four queries once passed vacuously this way)
                print(f"  ✗ {name}: VACUOUS (0 rows on both sides)")
                n_fail += 1
            else:
                print(f"  ✓ {name}")
                n_pass += 1
        except Exception:
            print(f"  ✗ {name}: EXCEPTION")
            traceback.print_exc()
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noorc} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
