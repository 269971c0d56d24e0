"""Driver-faithful memory gate for the staged correctness window.

r08 lesson, second iteration: ``tests/oracle_harness.py`` caps its
DuckDB connections at 4 GB, which keeps the parity suite stable but
HID the failure mode that killed 30 of r08's 50 driver slots — the
driver runs the window's oracles in ONE process with NO memory
limit, and oracles that retain mmap'd buffer blocks push the process
into the kernel's ``vm.max_map_count``, after which every later
allocation fails ("bad allocation"), including for trivially small
queries. "Local-green must be at least as unforgiving as
driver-green" therefore needs a window-ordered, shared-connection
sweep in CI, not just as an optional tool.

This test derives the CURRENT first-50 oracled window straight from
``QUERIES`` (the exact slice the driver will read), runs
``tools/window_sweep.py`` on it in a subprocess, and fails if live
mappings ever cross half of ``vm.max_map_count`` or any oracle
errors. On the pre-r09 oracles (run UNCAPPED — the pre-r10 contract)
this reproduces the r08 driver OOMs byte-for-byte at window position
21. Since the r10 self-cap policy every oracle embeds its own
``SET memory_limit='2GB'``, so the sweep now measures capped runs —
faithful to what any driver process executes in any topology; the
r10 window peaks around 1,183 live maps.

Runs at sf0.01 — the driver's correctness scale (~2-3 min).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from idr_data_pipelines_spark.driver_contract import WINDOW_MAP_BUDGET
from idr_data_pipelines_spark.queries import NO_ORACLE, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.map_sweep
def test_staged_window_stays_under_map_budget(tmp_path, sf_med):
    window = [n for n in list(QUERIES)[:50] if n not in NO_ORACLE]
    names = tmp_path / "window.txt"
    names.write_text("\n".join(window) + "\n")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "window_sweep.py"),
            "--window", str(names),
            "--sf", sf_med,
            "--limit-abs", str(WINDOW_MAP_BUDGET),
        ],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, (
        "window sweep failed — an oracle errored or live memory "
        "mappings crossed the budget (the r08 driver-OOM class):\n"
        + proc.stdout[-4000:]
        + proc.stderr[-2000:]
    )
