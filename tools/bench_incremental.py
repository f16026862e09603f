"""Incremental-vs-full event-chain measurement (VERDICT r6 #7 done
bar: "an incremental run at sf1 that touches only trailing event_date
partitions (plan-asserted) and hash-matches the full rebuild").

Correctness (hash equality + plan assertions + untouched pre-window
partitions) is test-pinned in tests/test_plans.py::
test_incremental_event_chain_matches_full_rebuild; THIS tool records
the sf1 economics: wall time of one trailing-day incremental run of
the event chain vs the full-pipeline rebuild of the same three
tables, plus how many event_date partitions each touches.

Run ALONE (fresh JVM, local[$SPARK_GRAFT_CPUS]).
Usage: python tools/bench_incremental.py [sf_dir] [out.json]
Default sf_dir: .scale/sf1.
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
if REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        REPO + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else REPO
    )

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scale", "sf1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_INCREMENTAL.json"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("etl_pipelines_spark-bench-incremental")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    from etl_pipelines_spark import session as _session
    from etl_pipelines_spark.plans.model import RunContext
    from etl_pipelines_spark.plans.warehouse import (
        build_warehouse_pipeline,
        run_incremental_event_chain,
    )
    from etl_pipelines_spark.queries import load
    from etl_pipelines_spark.sources.catalog import Catalog

    _session.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")

    ev = load(spark, sf_dir, "events")
    max_d = ev.select(F.max(F.to_date("ts"))).first()[0]
    since = max_d  # "last night's" partition(s)

    wh_dir = tempfile.mkdtemp(prefix="bench_inc_wh_")
    try:
        ctx = RunContext(
            spark=spark,
            catalog=Catalog(spark, wh_dir),
            source_dir=sf_dir,
            run_date=max_d,
        )
        pipe = build_warehouse_pipeline(parallel_within_group=True)
        t0 = time.perf_counter()
        results = pipe.run(ctx)
        full_s = time.perf_counter() - t0
        assert all(r.status == "success" for r in results), [
            r.name for r in results if r.status != "success"
        ]
        chain = ("ods.events", "ods.track_events", "dwh.sessions_mart")
        model_s = {
            r.name: round(r.seconds, 3)
            for r in results
            if r.name in chain
        }
        ods_path = ctx.catalog.path("ods.events")
        n_parts_total = sum(
            1 for d in os.listdir(ods_path) if d.startswith("event_date=")
        )
        # record pre-incremental file listings to count touched parts
        pre = {
            d: sorted(os.listdir(os.path.join(ods_path, d)))
            for d in os.listdir(ods_path)
            if d.startswith("event_date=")
        }
        t0 = time.perf_counter()
        run_incremental_event_chain(ctx, since)
        inc_s = time.perf_counter() - t0
        post = {
            d: sorted(os.listdir(os.path.join(ods_path, d)))
            for d in os.listdir(ods_path)
            if d.startswith("event_date=")
        }
        touched = sorted(
            d for d in post if pre.get(d) != post[d]
        )
        out = {
            "metric": "incremental_event_chain",
            "unit": "sec",
            "sf_dir": sf_dir,
            "since": since.isoformat(),
            "full_pipeline_s": round(full_s, 3),
            "event_chain_full_model_s": model_s,
            "event_chain_full_model_total_s": round(
                sum(model_s.values()), 3
            ),
            "incremental_s": round(inc_s, 3),
            "event_date_partitions_total": n_parts_total,
            "event_date_partitions_touched": touched,
        }
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(wh_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()


# Design note (100 TB): the incremental run's cost drivers are
# (a) the trailing-window raw scan — pushed ts predicate, so the
#     parquet reader skips row groups outside the window;
# (b) the W2 dynamic partition overwrite — rewrites only trailing
#     event_date partitions (touched-partition list recorded above);
# (c) the sessions recompute — semi-join on touched users, work
#     proportional to active users' history, not the corpus.
# Reference shape: Datawarehouse-ETL/30_segment_events/
# 05_all_events_incremental.sql:52,160-170.
