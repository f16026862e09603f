"""Dtype audit: catch driver hash mismatches caused by representation.

The driver's correctness gate hashes values after a toPandas()-style
conversion, so it is *type*-sensitive: DuckDB types an uncast integer
SUM() as HUGEINT (int128 -> pandas object/float64), while Spark emits
bigint (int64) — equal values, different hash (the round-1
s_sessionize_gap red row). This tool runs every oracle on DuckDB and
the matching Spark query, converts both to pandas, and reports any
per-column dtype divergence so oracles can be CAST-fixed before the
driver sees them.

Usage: python tools/audit_oracle_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from etl_pipelines_spark.queries import REGISTRY  # noqa: E402
from etl_pipelines_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# dtype pairs that hash identically after value conversion (calibrated
# against round-1 driver results): dates come back as
# object(datetime.date) from Spark but datetime64 from duckdb, and
# integer *widths* don't matter — rank()'s int32 vs DuckDB BIGINT
# hashed green everywhere in CORRECTNESS_r01. What broke the hash was
# int vs FLOAT: DuckDB's HUGEINT (uncast integer SUM) widens to pandas
# float64 while Spark emits int64 (the s_sessionize_gap red row).
_EQUIV = {
    ("object", "datetime64[us]"),
    ("object", "datetime64[ns]"),
    ("datetime64[us]", "datetime64[ns]"),
    ("int32", "int64"),
    ("int64", "int32"),
    ("int16", "int64"),
    ("int8", "int64"),
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("dtype-audit")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_bad = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        if spec.oracle is None:
            continue
        try:
            spdf = spec.spark(spark, sf_dir).toPandas()
            odf = con.execute(spec.oracle).df()
            sd = {c.lower(): str(d) for c, d in spdf.dtypes.items()}
            od = {c.lower(): str(d) for c, d in odf.dtypes.items()}
            bad = []
            for c in sorted(sd):
                s, o = sd[c], od.get(c, "<missing>")
                if s == o or (s, o) in _EQUIV or (o, s) in _EQUIV:
                    continue
                bad.append(f"{c}: spark={s} oracle={o}")
            if bad:
                n_bad += 1
                print(f"✗ {name}")
                for b in bad:
                    print(f"    {b}")
            else:
                print(f"✓ {name}")
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            print(f"✗ {name}: EXCEPTION {type(e).__name__}: {e}")
    print(f"\n{n_bad} queries with dtype risk")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
