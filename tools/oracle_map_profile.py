#!/usr/bin/env python
"""Profile the memory-mapping cost of DuckDB oracles, driver-style.

r08 post-mortem (VERDICT r08 "What's wrong"): the driver runs each
round's 50 oracles sequentially in ONE process with NO DuckDB
``memory_limit``. DuckDB's buffer manager allocates 256 KB blocks that
glibc serves as one mmap each, and several oracle shapes (64-term
unrolled dot products inside window functions) RETAIN tens of
thousands of those blocks after the query completes. The kernel's
``vm.max_map_count`` (65,530 here) is then exhausted mid-window and
every later allocation — DuckDB's or pandas' — dies with
"bad allocation", regardless of how small it is. 30 of r08's 50
correctness slots were lost this way.

This tool measures each oracle's FRESH-CONNECTION map delta exactly
the way the judge did: fork a clean subprocess per oracle, connect an
UNCAPPED DuckDB, register the sf views, ``execute(sql).df()``, then
read ``/proc/self/maps`` line count before/after. The delta is the
number of mappings the oracle retains while its connection lives —
the quantity that accumulates across a driver window.

Usage:
    python tools/oracle_map_profile.py NAME [NAME ...]
    python tools/oracle_map_profile.py --window tools/r09_window_names.txt
    python tools/oracle_map_profile.py --all          # every oracle
    python tools/oracle_map_profile.py --sf /root/testdata/sf0.01

Budget doctrine (enforced by tools/rotate_window.py): a single oracle
whose fresh-connection delta exceeds ~2,000 maps is a staging defect
and must be REWRITTEN (unrolled expression chains -> list_reduce
folds / narrow MATERIALIZED CTEs). Calibration on this host: every
healthy oracle lands at ~650-1,000 (per-connection buffer-pool churn,
released on close); the r08 bombs measured 8,900-29,900 here and
their retention accumulated across the driver window's SHARED
connection. Because the ~700 baseline is per-connection and
transient, do NOT sum these deltas as a window estimate — the
shared-connection sweep (tools/window_sweep.py: r09 window peaks at
~2,600 live maps; the pre-fix r08 window hits the 65,530 kernel
limit at position 21) is the cumulative metric.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = r"""
import json, sys
import duckdb

sf_dir, repo = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
sql = sys.stdin.read()

from idr_data_pipelines_spark.driver_contract import create_views


def n_maps():
    with open("/proc/self/maps") as fh:
        return sum(1 for _ in fh)


# No harness-level cap: since the r10 self-cap policy every oracle's
# own SQL asserts SET memory_limit='2GB', so this connection runs at
# exactly the limit any driver process would apply — the measurement
# is capped BY THE ORACLE, not by this tool (ad-hoc SQL without an
# embedded SET runs uncapped here).
con = duckdb.connect()
create_views(con, sf_dir)
before = n_maps()
df = con.execute(sql).df()
after = n_maps()
print(json.dumps({"maps_before": before, "maps_after": after,
                  "delta": after - before, "rows": len(df)}))
"""


def profile_one(name: str, sql: str, sf_dir: str, timeout: int = 300) -> dict:
    """Fresh-subprocess map delta for one oracle (judge's method)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, sf_dir, repo],
            input=sql.encode(),
            capture_output=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"name": name, "err": "timeout"}
    if proc.returncode != 0:
        tail = proc.stderr.decode(errors="replace").strip().splitlines()[-1:]
        return {"name": name, "err": tail[0] if tail else "nonzero exit"}
    out = json.loads(proc.stdout.decode().strip().splitlines()[-1])
    out["name"] = name
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--window", help="file with one oracle name per line")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", action="store_true", help="one JSON line out")
    args = ap.parse_args()

    from idr_data_pipelines_spark.driver_contract import (
        PER_ORACLE_MAP_BUDGET,
    )
    from idr_data_pipelines_spark.queries import ORACLES

    if args.window:
        with open(args.window) as fh:
            names = [ln.strip() for ln in fh if ln.strip()]
    elif args.all:
        names = list(ORACLES)
    else:
        names = args.names
    if not names:
        ap.error("give NAMEs, --window FILE, or --all")

    results = []
    for n in names:
        if n not in ORACLES:
            results.append({"name": n, "err": "no oracle"})
            continue
        r = profile_one(n, ORACLES[n], args.sf)
        results.append(r)
        if not args.json:
            if "err" in r:
                print(f"{n:36s}  ERR {r['err']}")
            else:
                # same budget the staging gate refuses on — imported,
                # not a literal, so the tools can't drift (r10 review)
                flag = (
                    "  <-- MAP BOMB"
                    if r["delta"] > PER_ORACLE_MAP_BUDGET
                    else ""
                )
                print(f"{n:36s}  delta {r['delta']:>7d}  rows {r['rows']:>7d}{flag}")
            sys.stdout.flush()
    if args.json:
        print(json.dumps({r["name"]: r for r in results}))
    total = sum(r.get("delta", 0) for r in results)
    print(f"# cumulative delta estimate: {total}", file=sys.stderr)


if __name__ == "__main__":
    main()
