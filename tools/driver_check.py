"""Driver-faithful correctness gate: the exact .claude/skills/verify
recipe as a script. Unlike tools/verify_queries.py (which uses the
engine's own session), this imports /root/repo/__spark_entry__.py the
way the driver does — fresh module load, PLAIN SparkSession (no
engine conf; the module must pin its own via session.configure),
from an arbitrary cwd (catches worker closures that pickle package
references) — then smoke-checks entry() and hash-compares every
queries() entry against its oracle_sql() in DuckDB.

Usage: python tools/driver_check.py [sf_dir] [query ...]
Run it from OUTSIDE the repo directory to get the cwd coverage.
"""
import hashlib
import importlib.util
import os
import sys

import duckdb
from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = set(sys.argv[2:])

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .getOrCreate())

# step 3: smoke
rows = mod.entry(spark).collect()
print(f"MARKER smoke entry(): {len(rows)} rows", flush=True)
assert len(rows) > 0

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

qs = mod.queries()
osql = mod.oracle_sql()
n_pass = n_fail = n_rowsonly = 0
fails = []


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from canon import pandas_canon as _pandas_canon  # noqa: E402


for name, fn in qs.items():
    if only and name not in only:
        continue
    try:
        df = fn(spark, SF)
        cols = sorted(df.columns)
        # Driver-faithful canonicalization probe (must not raise).
        spdf = _pandas_canon(df.toPandas())
        srows = sorted(repr(tuple(r[c] for c in cols)) for r in df.collect())
        shash = hashlib.sha256("\n".join(srows).encode()).hexdigest()
        if name not in osql:
            n_rowsonly += 1
            print(f"MARKER rows-only {name}: {len(srows)} rows", flush=True)
            continue
        ores = con.execute(osql[name])
        ocols_pre = [d[0] for d in ores.description]
        oraw = ores.fetchall()
        # Re-execute for the pandas form (duckdb execute returns the
        # connection; fetching .df() first would drain the cursor).
        opdf = con.execute(osql[name]).df()
        opdf = opdf.rename(
            columns={c: next((s for s in cols if s.lower() == c.lower()), c)
                     for c in opdf.columns})
        opdf = _pandas_canon(opdf)
        # Numeric-kind divergence (e.g. DuckDB HUGEINT -> float64 vs
        # Spark bigint -> int64) changes the driver's hashed values even
        # when repr-compare matches. Only NUMERIC kinds are checked:
        # date columns legitimately arrive as object (Spark) vs
        # datetime64 (DuckDB) and the driver normalizes those — 18
        # driver-green queries prove it.
        NUM = set("iufb")
        kinds = [
            (c, spdf[c].dtype.kind, opdf[c].dtype.kind)
            for c in spdf.columns
            if len(spdf) and len(opdf)
            and spdf[c].dtype.kind != opdf[c].dtype.kind
            and spdf[c].dtype.kind in NUM and opdf[c].dtype.kind in NUM
            # pandas widens nullable ints to float; only flag when
            # NEITHER side has nulls.
            and not (spdf[c].isna().any() or opdf[c].isna().any())
        ]
        if kinds:
            n_fail += 1
            fails.append(name)
            print(f"MARKER FAIL {name}: pandas dtype-kind mismatch {kinds} "
                  f"(driver hashes pandas values — cast the oracle)", flush=True)
            continue
        idx = {c.lower(): i for i, c in enumerate(ocols_pre)}
        orows = sorted(
            repr(tuple(r[idx[c.lower()]] for c in cols)) for r in oraw)
        ohash = hashlib.sha256("\n".join(orows).encode()).hexdigest()
        if shash == ohash and len(srows) > 0:
            n_pass += 1
            print(f"MARKER pass {name} ({len(srows)} rows)", flush=True)
        else:
            n_fail += 1
            fails.append(name)
            diff = next((i for i, (a, b) in enumerate(zip(srows, orows)) if a != b), -1)
            print(f"MARKER FAIL {name}: rows {len(srows)}/{len(orows)} "
                  f"hash {shash == ohash} firstdiff {diff}", flush=True)
            if diff >= 0:
                print(f"  spark:  {srows[diff][:300]}", flush=True)
                print(f"  oracle: {orows[diff][:300]}", flush=True)
    except Exception as e:  # noqa: BLE001
        n_fail += 1
        fails.append(name)
        print(f"MARKER FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)

print(f"MARKER TOTAL pass={n_pass} fail={n_fail} rowsonly={n_rowsonly} fails={fails}",
      flush=True)
sys.exit(1 if n_fail else 0)
