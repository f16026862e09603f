"""Scale-slope bench: times the headline queries at sf0.1 AND at the
replicated 10x point (.scale/sf1, built by tools/make_scale.py), and
writes BENCH_SF1.json with the per-query ratio.

Why (r3 VERDICT "Next round" #1): PLANS.md's 100 TB claims are
plan-shape-locked but were measured at one scale point. A ~10x
linear slope (sub-linear for the sketch paths, whose state is fixed
size) is the empirical leg — and any hidden single-reducer stage
shows up as a super-linear ratio automatically.

Run it ALONE (bench timings are invalid if any other Spark job shares
the machine). Usage: python tools/bench_scale.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO, ".scale", "sf1")


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    from bench_lines import parse_bench_stdout

    return parse_bench_stdout(out.stdout)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_SF1.json"
    )
    if not os.path.isdir(SF1_DIR):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_scale.py")],
            check=True,
        )
    small = run_bench("/root/testdata/sf0.1")
    big = run_bench(SF1_DIR)
    slopes = {
        name: {
            "sf0.1_sec": small["queries"][name],
            "sf1_sec": big["queries"][name],
            "ratio": round(
                big["queries"][name] / max(small["queries"][name], 1e-9), 2
            ),
        }
        for name in small["queries"]
        if name in big["queries"]
    }
    doc = {
        "metric": "scale_slope_sf0.1_to_sf1",
        "data_factor": 10,
        "total_sf0.1_sec": small["value"],
        "total_sf1_sec": big["value"],
        "queries": slopes,
        "note": (
            "ratio ~<=10 = linear-or-better scaling at 10x data on "
            "fixed local[32] resources; sketch/fixed-state paths "
            "should be well under 10; a ratio >> 10 flags a "
            "super-linear stage (single-reducer sort, quadratic "
            "verify) at that query"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
