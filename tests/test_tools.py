"""Regression tests for the repo-root measurement tools.

bench_diff's classification must not use a union noise band: bench.py
records ``queries[name] == spread[name]["min"]``, so a band that unions
both runs' spreads always contains the new value and every regression
reads as within-noise (round-6 review finding).
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run_diff(tmp_path, old, new):
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    a.write_text(json.dumps(old))
    b.write_text(json.dumps(new))
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_diff.py"), str(a), str(b)],
        capture_output=True,
        text=True,
        check=True,
    )
    return res.stdout


def _bench(value, queries, spread):
    return {"value": value, "queries": queries, "spread": spread}


def test_disjoint_regression_is_flagged(tmp_path):
    # new spread entirely above old spread -> REGRESSED even though
    # both files carry spread (the union-band bug reported this as
    # within-noise).
    out = _run_diff(
        tmp_path,
        _bench(1.0, {"q1": 1.0}, {"q1": {"min": 1.0, "median": 1.05, "max": 1.1}}),
        _bench(2.0, {"q1": 2.0}, {"q1": {"min": 2.0, "median": 2.1, "max": 2.2}}),
    )
    assert "REGRESSED" in out


def test_overlapping_spread_is_noise(tmp_path):
    out = _run_diff(
        tmp_path,
        _bench(1.0, {"q1": 1.0}, {"q1": {"min": 1.0, "median": 1.2, "max": 1.5}}),
        _bench(1.3, {"q1": 1.3}, {"q1": {"min": 1.3, "median": 1.4, "max": 1.6}}),
    )
    assert "within-noise" in out
    assert "REGRESSED" not in out


def test_disjoint_improvement_is_flagged(tmp_path):
    out = _run_diff(
        tmp_path,
        _bench(2.0, {"q1": 2.0}, {"q1": {"min": 2.0, "median": 2.1, "max": 2.2}}),
        _bench(1.0, {"q1": 1.0}, {"q1": {"min": 1.0, "median": 1.05, "max": 1.1}}),
    )
    assert "IMPROVED" in out


def test_removed_query_is_reported(tmp_path):
    # a query that vanishes between rounds must not silently read as a
    # total-time improvement.
    out = _run_diff(
        tmp_path,
        _bench(2.0, {"q1": 1.0, "q2": 1.0}, {}),
        _bench(1.0, {"q1": 1.0}, {}),
    )
    assert "REMOVED" in out


def test_new_query_is_reported(tmp_path):
    out = _run_diff(
        tmp_path,
        _bench(1.0, {"q1": 1.0}, {}),
        _bench(2.0, {"q1": 1.0, "q2": 1.0}, {}),
    )
    assert "NEW" in out
