"""Stage-volume instrumentation for dd_embedding_neardup (r7 VERDICT
#7): candidate-pair and verified-pair counts plus stage wall times at
both second-decade scale points, the same measurement that
root-caused the minhash slope (PLANS.md second-decade section).

If candidates grow ~linearly with the corpus while wall time grows
super-linearly, the slope lives in a JOIN PLAN (broadcast→SMJ cliff),
not the sketch geometry — and vice versa.

Usage: python tools/instrument_neardup.py [out.json]
Requires .scale/sf1 and .scale/sf10 (tools/make_scale.py).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from etl_pipelines_spark import session as _session  # noqa: E402
from etl_pipelines_spark.queries import load_spread  # noqa: E402
from etl_pipelines_spark.textops.similarity import (  # noqa: E402
    lsh_neardup_pairs,
)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "INSTRUMENT_NEARDUP.json"
    )
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("instrument-neardup")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    _session.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))

    result: dict = {"metric": "neardup_stage_volumes"}
    for label in ("sf1", "sf10"):
        sf_dir = os.path.join(REPO, ".scale", label)
        e = load_spread(spark, sf_dir, "embeddings")
        n = e.count()
        kw = dict(
            threshold=0.4, dim=64, n_planes=6, n_tables=4, auto_planes=True
        )
        # warm-up: one untimed full pass absorbs JVM/codegen/Python
        # worker spawn (the first-ever run otherwise bills cold-start
        # to whichever stage runs first — r8's first capture showed a
        # negative verify share from exactly that)
        lsh_neardup_pairs(e, **kw).count()
        cand = lsh_neardup_pairs(e, candidates_only=True, **kw)
        t0 = time.perf_counter()
        n_cand = cand.count()
        t_cand = time.perf_counter() - t0
        pairs = lsh_neardup_pairs(e, **kw)
        t0 = time.perf_counter()
        n_ver = pairs.count()
        t_full = time.perf_counter() - t0
        result[label] = {
            "corpus": n,
            "candidate_pairs": n_cand,
            "verified_pairs": n_ver,
            "candidate_stage_sec": round(t_cand, 3),
            "full_pipeline_sec": round(t_full, 3),
            "verify_share_sec": round(t_full - t_cand, 3),
        }
    a, b = result["sf1"], result["sf10"]
    result["slopes"] = {
        "corpus": round(b["corpus"] / a["corpus"], 2),
        "candidate_pairs": round(
            b["candidate_pairs"] / max(a["candidate_pairs"], 1), 2
        ),
        "candidate_stage": round(
            b["candidate_stage_sec"] / max(a["candidate_stage_sec"], 1e-9), 2
        ),
        "full_pipeline": round(
            b["full_pipeline_sec"] / max(a["full_pipeline_sec"], 1e-9), 2
        ),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
