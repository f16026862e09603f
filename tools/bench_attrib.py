"""Write-included vs compute-only attribution for the
materialization-dominated rebuild slopes (VERDICT r10 #4): the
committed BENCH_SF10 sequential slopes for `dwh.affiliate_payout`
(×6.94, measured BEFORE the r10 broadcast removal), `mon.table_stats`
(×3.94) and `dwh.collection_curves` (×3.57) mix plan cost with
parquet-write cost. This tool separates them:

1. run the nightly pipeline once per scale point (materializes every
   upstream dependency into a temp warehouse),
2. for each target model, time the SAME DataFrame twice —
   noop-format write (compute wall: full execution, zero output IO)
   and writers.full_refresh to a scratch dir (write-included wall,
   the rebuild's actual cost) — best-of-3 each,
3. emit per-model sf1→sf10 slopes for BOTH attributions.

Run it ALONE (quiet box). Usage: python tools/bench_attrib.py [out.json]
"""
from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TARGETS = [
    "dwh.affiliate_payout",
    "mon.table_stats",
    "dwh.collection_curves",
]


def measure(sf_dir: str) -> dict:
    from pyspark.sql import SparkSession

    from etl_pipelines_spark import session
    from etl_pipelines_spark.plans.model import RunContext
    from etl_pipelines_spark.plans.warehouse import build_warehouse_pipeline
    from etl_pipelines_spark.sources import writers
    from etl_pipelines_spark.sources.catalog import Catalog

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", cpus)
        .getOrCreate()
    )
    session.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")

    wh_dir = tempfile.mkdtemp(prefix="attrib_wh_")
    scratch = tempfile.mkdtemp(prefix="attrib_out_")
    try:
        ctx = RunContext(
            spark=spark,
            catalog=Catalog(spark, wh_dir),
            source_dir=sf_dir,
            run_date=dt.date(1998, 8, 2),
        )
        pipe = build_warehouse_pipeline()
        results = pipe.run(ctx)
        failed = [r.name for r in results if r.status != "success"]
        if failed:
            raise SystemExit(f"pipeline failed: {failed}")
        models = {
            m.name: m for g in pipe.groups for m in g.models
        }
        out: dict[str, dict] = {}
        for name in TARGETS:
            m = models[name]
            compute = []
            write = []
            for _ in range(3):
                df = m.build(ctx)
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                compute.append(time.perf_counter() - t0)
            for k in range(3):
                df = m.build(ctx)
                path = os.path.join(
                    scratch, name.replace(".", "_") + f"_{k}"
                )
                t0 = time.perf_counter()
                writers.full_refresh(df, path, m.partition_by)
                write.append(time.perf_counter() - t0)
                shutil.rmtree(path, ignore_errors=True)
            out[name] = {
                "compute_sec": round(min(compute), 3),
                "write_included_sec": round(min(write), 3),
            }
        return out
    finally:
        shutil.rmtree(wh_dir, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_ATTRIB.json"
    )
    sf1 = os.path.join(REPO, ".scale", "sf1")
    sf10 = os.path.join(REPO, ".scale", "sf10")
    mid = measure(sf1)
    big = measure(sf10)
    result = {"metric": "rebuild_write_attribution", "unit": "sec",
              "models": {}}
    for name in TARGETS:
        c1, c10 = mid[name]["compute_sec"], big[name]["compute_sec"]
        w1, w10 = (mid[name]["write_included_sec"],
                   big[name]["write_included_sec"])
        result["models"][name] = {
            "sf1": mid[name], "sf10": big[name],
            "slope_compute": round(c10 / c1, 2) if c1 else None,
            "slope_write_included": round(w10 / w1, 2) if w1 else None,
            "write_share_sf10": round((w10 - c10) / w10, 3)
            if w10 else None,
        }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
