"""Second scale decade (VERDICT r4 #3 / r5 #3): sf1 -> sf10 slopes
for the scale-claiming subset.

Builds `.scale/sf10` (factor 100 replication of sf0.1 — see
make_scale.py: affine letter maps and roll+sign embedding variants
keep the near-dup / LSH candidate rates flat at 100 replicas, where
caesar/roll alone would repeat after 26/64 and hand every doc exact
twins), then times the subset at BOTH decade points and writes
BENCH_SF10.json with per-query sf1->sf10 ratios.

The subset = the queries whose 100 TB story depends on a measured
slope: the adaptive-geometry dedup family (occupancy ladder,
SemDeDup auto_refine), the min-count-pruned bigram LM (built to fix
the ×4.55 unpruned slope — its pruned slope was previously
unmeasured) with the unpruned form as contrast, the fixed-state
sketches, the zero-exchange global-rank sampler, the SCD2 rebuild,
one relational anchor, and the re-layered 31-model nightly rebuild.

Run it ALONE. Usage: python tools/bench_scale10.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO, ".scale", "sf1")
SF10_DIR = os.path.join(REPO, ".scale", "sf10")

SUBSET = [
    "q1_pricing_summary",
    "scd2_history",
    "dd_minhash_lsh",
    "dd_line_dedup",
    "dd_embedding_neardup",
    "dd_semantic_dedup",
    "mon_hll_distinct",
    "mon_cms_heavyhitters",
    "txt_weighted_sample",
    "txt_bigram_logprob",
    "txt_bigram_logprob_pruned",
]


def run_bench(sf_dir: str, reps: int, rebuild_mode: str = "par") -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_QUERIES=",".join(
            SUBSET if rebuild_mode == "par" else SUBSET[:1]
        ),
        SPARK_GRAFT_BENCH_REPS=str(reps),
        SPARK_GRAFT_REBUILD_MODE=rebuild_mode,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    from bench_lines import parse_bench_stdout

    return parse_bench_stdout(out.stdout)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_SF10.json"
    )
    if not os.path.isdir(SF1_DIR):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_scale.py")],
            check=True,
        )
    if not os.path.isdir(SF10_DIR):
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "make_scale.py"),
                "/root/testdata/sf0.1",
                SF10_DIR,
                "100",
            ],
            check=True,
        )
    mid = run_bench(SF1_DIR, reps=2)
    big = run_bench(SF10_DIR, reps=2)
    # sequential-mode rebuild: parallel-group wall times overlap, so
    # per-model slopes carry co-scheduling phantoms (the r8
    # master_historical ×13 that read ×2.5 clean); the sequential
    # pass gives each model the whole machine and makes the slope
    # attributable. One run per decade, rebuild only.
    mid_seq = run_bench(SF1_DIR, reps=1, rebuild_mode="seq")
    big_seq = run_bench(SF10_DIR, reps=1, rebuild_mode="seq")
    slopes = {
        name: {
            "sf1_sec": mid["queries"][name],
            "sf10_sec": big["queries"][name],
            "ratio": round(
                big["queries"][name] / max(mid["queries"][name], 1e-9), 2
            ),
        }
        for name in mid["queries"]
        if name in big["queries"]
    }
    # per-model rebuild slopes (r6 verdict #6: the ×4.5/decade
    # aggregate must localize to a model in one read)
    def _model_slopes(a: dict, b: dict) -> dict:
        m1 = a.get("wh_rebuild_models", {})
        m10 = b.get("wh_rebuild_models", {})
        return {
            name: {
                "sf1_sec": m1[name],
                "sf10_sec": m10[name],
                "ratio": round(m10[name] / max(m1[name], 1e-9), 2),
            }
            for name in m1
            if name in m10
        }

    model_slopes = _model_slopes(mid, big)
    model_slopes_seq = _model_slopes(mid_seq, big_seq)
    doc = {
        "metric": "scale_slope_sf1_to_sf10",
        "data_factor": 10,
        "total_sf1_sec": mid["value"],
        "total_sf10_sec": big["value"],
        "queries": slopes,
        "rebuild_models": dict(
            sorted(
                model_slopes.items(),
                key=lambda kv: -kv[1]["sf10_sec"],
            )
        ),
        "rebuild_models_sequential": dict(
            sorted(
                model_slopes_seq.items(),
                key=lambda kv: -kv[1]["sf10_sec"],
            )
        ),
        "rebuild_seq_total_sf1_sec": mid_seq.get("queries", {}).get(
            "wh_full_rebuild"
        ) or mid_seq.get("wh_full_rebuild"),
        "rebuild_seq_total_sf10_sec": big_seq.get("queries", {}).get(
            "wh_full_rebuild"
        ) or big_seq.get("wh_full_rebuild"),
        "note": (
            "second decade: ratio <=10 = linear-or-better at 10x "
            "data on fixed local[32]; the pruned bigram LM and the "
            "adaptive-geometry dedup family are the claims under "
            "test (r5 verdict #3); wh_full_rebuild is the re-layered "
            "31-model nightly DAG with full parquet materialization"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
