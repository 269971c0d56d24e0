"""The staging gate must REFUSE an over-budget window (VERDICT r09
item 7).

``tests/test_window_sweep.py`` proves the CURRENT window passes the
gate; nothing proved the gate itself still rejects — the r08 pre-fix
reproduction lived only in docstrings, so a regression that made the
gate permanently green (e.g. an inverted comparison) would ship a
window the driver could OOM on. Both refusal levels are pinned here:

1. per-oracle: ``rotate_window.enforce_map_budget`` must ``sys.exit``
   when any oracle's fresh-connection map delta exceeds
   ``PER_ORACLE_MAP_BUDGET`` (fed a synthetic over-budget profile —
   no real profiling, so the test is fast);
2. window-cumulative: ``tools/window_sweep.py`` must return nonzero
   when live mappings cross ``--limit-abs`` (run with an absurdly low
   limit a healthy oracle is guaranteed to cross).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")


def _import_tools():
    if TOOLS not in sys.path:
        sys.path.insert(0, TOOLS)
    import oracle_map_profile
    import rotate_window

    return rotate_window, oracle_map_profile


def test_per_oracle_gate_refuses_heavy_profile(monkeypatch):
    rotate_window, oracle_map_profile = _import_tools()
    from idr_data_pipelines_spark.driver_contract import (
        PER_ORACLE_MAP_BUDGET,
    )

    deltas = {"ok_entry": 700, "bomb_entry": PER_ORACLE_MAP_BUDGET + 1}
    monkeypatch.setattr(
        oracle_map_profile,
        "profile_one",
        lambda name, sql, sf: {"delta": deltas[name]},
    )
    with pytest.raises(SystemExit) as exc:
        rotate_window.enforce_map_budget(
            ["ok_entry", "bomb_entry"],
            {"ok_entry": "SELECT 1", "bomb_entry": "SELECT 1"},
            "/root/testdata/sf0.01",
        )
    assert "REFUSING to stage" in str(exc.value)
    assert "bomb_entry" in str(exc.value)
    assert "ok_entry" not in str(exc.value)


def test_per_oracle_gate_refuses_on_profile_error(monkeypatch):
    rotate_window, oracle_map_profile = _import_tools()
    monkeypatch.setattr(
        oracle_map_profile,
        "profile_one",
        lambda name, sql, sf: {"err": "boom"},
    )
    with pytest.raises(SystemExit) as exc:
        rotate_window.enforce_map_budget(
            ["broken"], {"broken": "SELECT 1"}, "/root/testdata/sf0.01"
        )
    assert "profile failed" in str(exc.value)


def test_window_sweep_refuses_over_budget(tmp_path, sf_dir):
    """An impossible --limit-abs (far below the ~700-map connection
    baseline) must make the sweep exit nonzero — the cumulative gate's
    refusal path, exercised end-to-end on one cheap real oracle."""
    names = tmp_path / "window.txt"
    names.write_text("expr_extract\n")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(TOOLS, "window_sweep.py"),
            "--window", str(names),
            "--sf", sf_dir,
            "--limit-abs", "10",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode != 0, (
        "sweep accepted a window whose live mappings exceed the "
        f"budget:\n{proc.stdout[-2000:]}{proc.stderr[-1000:]}"
    )
