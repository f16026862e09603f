"""The shared bench-output parser (ADVICE r8: per-line tolerance;
r8 driver artifact: headline line must be LAST so the driver's
last-JSON-line tail parse reads the headline, not an aux map)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)
from bench_lines import parse_bench_stdout  # noqa: E402


def test_merges_aux_maps_and_skips_json_shaped_noise():
    out = "\n".join(
        [
            "25/08/16 INFO something",
            "{py4j noise that is not JSON",
            '{"metric": "wh_rebuild_models", "unit": "sec", "models": {"m": 1.5}}',
            '{"metric": "headline_queries_total", "value": 2.0, "queries": {"q": 2.0}}',
        ]
    )
    h = parse_bench_stdout(out)
    assert h["value"] == 2.0
    assert h["wh_rebuild_models"] == {"m": 1.5}


def test_raises_without_headline():
    with pytest.raises(RuntimeError, match="no headline"):
        parse_bench_stdout('{"metric": "other"}\n')


def test_bench_prints_headline_last():
    """The driver parses the LAST JSON line of its tail capture
    (BENCH_r08 parsed the aux line when it was printed after the
    headline) — pin bench.py's print order: aux maps first,
    headline print is the final print in main()."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(os.path.join(repo, "bench.py")).read()
    aux = src.index('"metric": "wh_rebuild_models"')
    headline = src.index("print(json.dumps(out))")
    assert aux < headline
