"""Shared parser for bench.py's multi-line JSON output.

bench.py prints auxiliary metric lines (wh_rebuild_models) FIRST and
the headline line LAST (the driver parses the last JSON line of its
tail capture — see bench.py). The repeat/scale tools re-merge the
aux maps into the headline dict here.

Per-line parsing is tolerant (ADVICE r8): a Spark/py4j log line that
happens to start with '{' must be skipped, not kill a multi-hour
scale run with JSONDecodeError.
"""

from __future__ import annotations

import json


def parse_bench_stdout(stdout: str) -> dict:
    """Return the headline bench dict with auxiliary metric maps
    (e.g. ``wh_rebuild_models``) merged in. Raises RuntimeError when
    no headline line is present."""
    docs = []
    for line in stdout.strip().splitlines():
        if not line.startswith("{"):
            continue
        try:
            doc = json.loads(line)
        except json.JSONDecodeError:
            continue  # log noise shaped like JSON — not ours
        if isinstance(doc, dict):
            docs.append(doc)
    headline = next(
        (d for d in docs if d.get("metric") == "headline_queries_total"),
        None,
    )
    if headline is None:
        raise RuntimeError(
            f"no headline JSON line in bench output:\n{stdout[-2000:]}"
        )
    for d in docs:
        if d.get("metric") == "wh_rebuild_models":
            headline["wh_rebuild_models"] = d["models"]
    return headline
