"""Unit tests for the bench comparison discipline (tools/benchdiff.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.benchdiff import compare


def _bench(queries, spread=None, cal=None):
    d = {"queries": queries, "spread": spread or {}}
    if cal is not None:
        d["calibration_sec"] = cal
    return d


def test_calibration_normalizes_away_host_speed():
    """A uniformly 25% slower sweep on a 25% slower host is NOT a
    regression once normalized."""
    old = _bench({"q": 1.0}, {"q": {"min": 0.98, "max": 1.02}}, cal=0.10)
    new = _bench({"q": 1.25}, {"q": {"min": 1.22, "max": 1.28}}, cal=0.125)
    out = compare(old, new)
    assert out["attributable"] and abs(out["calibration_ratio"] - 0.8) < 1e-9
    assert not out["regressions"] and not out["improvements"]


def test_real_regression_survives_normalization():
    old = _bench({"q": 1.0}, {"q": {"min": 0.98, "max": 1.02}}, cal=0.10)
    new = _bench({"q": 2.0}, {"q": {"min": 1.95, "max": 2.05}}, cal=0.10)
    out = compare(old, new)
    assert [e["query"] for e in out["regressions"]] == ["q"]
    assert out["regressions"][0]["delta_pct"] == 100.0


def test_overlapping_windows_suppress_flag():
    """A 30% median delta whose spread windows overlap is noise by the
    harness's own definition."""
    old = _bench({"q": 1.0}, {"q": {"min": 0.7, "max": 1.4}}, cal=0.1)
    new = _bench({"q": 1.3}, {"q": {"min": 0.9, "max": 1.6}}, cal=0.1)
    out = compare(old, new)
    assert not out["regressions"]


def test_missing_calibration_marks_unattributable():
    out = compare(_bench({"q": 1.0}), _bench({"q": 2.0}))
    assert out["attributable"] is False
    assert out["calibration_ratio"] is None
