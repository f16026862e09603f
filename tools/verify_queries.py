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


def norm_cell(v):
    if isinstance(v, float):
        return v
    return v


def compare(name, spark_df, con, oracle):
    sdf = spark_df.toPandas()
    odf = con.execute(oracle).fetchdf()
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if [c.lower() for c in scols] != [c.lower() for c in ocols]:
        problems.append(f"schema spark={scols} oracle={ocols}")
        return problems
    sdf = sdf[scols].sort_values(scols, kind="mergesort").reset_index(drop=True)
    odf = odf[ocols].sort_values(ocols, kind="mergesort").reset_index(drop=True)
    if len(sdf) != len(odf):
        return problems
    max_float_diff = 0.0
    n_mismatch = 0
    example = None
    for col in scols:
        sv, ov = sdf[col].tolist(), odf[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a is None and b is None:
                continue
            try:
                if a != b and not (isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b)):
                    if isinstance(a, float) and isinstance(b, float):
                        d = abs(a - b)
                        max_float_diff = max(max_float_diff, d)
                    n_mismatch += 1
                    if example is None:
                        example = (col, i, a, b)
            except (TypeError, ValueError):
                # pandas NaN vs None etc.
                a_nan = a is None or (isinstance(a, float) and math.isnan(a))
                b_nan = b is None or (isinstance(b, float) and math.isnan(b))
                if not (a_nan and b_nan):
                    n_mismatch += 1
                    if example is None:
                        example = (col, i, a, b)
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
