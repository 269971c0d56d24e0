#!/usr/bin/env python
"""Driver-faithful memory sweep of a staged correctness window.

The driver runs a round's 50 oracles sequentially in ONE process with
NO DuckDB ``memory_limit``. ``tests/oracle_harness.py`` deliberately
caps its connections at 4 GB, which keeps the parity suite stable but
HIDES the failure mode that killed 30 of r08's 50 slots: oracles that
retain tens of thousands of mmap'd buffer blocks push the process
into the kernel's ``vm.max_map_count``, after which every later
allocation — however small, DuckDB's or pandas' — fails with
"bad allocation". Local-green under a cap is not driver-green.

This sweep is the uncapped, window-ordered, single-process mirror the
r08 post-mortem demanded: ONE uncapped connection runs every oracle
of a staged window in its exact order, recording ``/proc/self/maps``
after each. It FAILS (exit 1) if the live map count ever crosses
``--limit-frac`` (default 0.5) of ``vm.max_map_count``.

ONE connection, not one per query, is the load-bearing choice:
measured on this host, the r08 bomb oracles' retained blocks are
RELEASED when their connection closes (ann_ivfpq_recall spikes to
12.6k maps, drops to ~910 on close) — a per-query-connection sweep
passes the r08 window and misses the entire failure class. Only a
shared connection accumulates retention the way the driver's window
run did.

Calibration, measured on this host (max_map_count 65,530):
- pre-fix oracles (unrolled 64-term dot products), r08 window order:
  live maps reach 65,532 (the kernel limit) at position 21, and
  positions 22-23 die with the EXACT r08 driver error ("Failed to
  allocate block of 32768 bytes (bad allocation)") — the failure
  mode reproduces under this sweep.
- post-rewrite (list_reduce folds): the full 50-query r09 window
  peaks at ~2,400 live mappings (re-measured after the RESET fix
  below) — 27× under the kernel limit.

CONTRACT CHANGE with the r10 self-cap policy: since r10 every oracle
embeds its own ``SET memory_limit='2GB'`` prefix (queries.py policy
block), so the sweep measures CAPPED runs — which is exactly what any
driver process now experiences, in any topology. The per-oracle RESET
below is kept so the harness-level cap of an earlier position never
leaks into a later one: after the RESET, each position's limit is
precisely what its own SQL sets (the embedded 2 GB), nothing else.
The "uncapped worst case" framing above describes the PRE-r10 gate
(and remains how the r08 reproduction was measured); the calibration
history stands, with the post-policy r10 window peaking at ~1,183
live maps.

Usage:
    python tools/window_sweep.py --window tools/r09_window_names.txt
    python tools/window_sweep.py --window ... --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def n_maps() -> int:
    with open("/proc/self/maps") as fh:
        return sum(1 for _ in fh)


def max_map_count() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as fh:
            return int(fh.read())
    except OSError:
        return 65530


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--limit-frac", type=float, default=0.5)
    ap.add_argument(
        "--limit-abs",
        type=int,
        default=None,
        help="absolute live-map budget; overrides --limit-frac",
    )
    args = ap.parse_args()

    import duckdb

    from idr_data_pipelines_spark.driver_contract import create_views
    from idr_data_pipelines_spark.queries import ORACLES

    with open(args.window) as fh:
        names = [ln.strip() for ln in fh if ln.strip()]

    if args.limit_abs is not None:
        budget, basis = args.limit_abs, "absolute"
    else:
        budget = int(max_map_count() * args.limit_frac)
        basis = f"{args.limit_frac:.0%} of {max_map_count()}"
    peak = 0
    failed = False
    # ONE shared connection: driver-faithful. No harness-level cap —
    # since the r10 self-cap policy each oracle's own SQL re-asserts
    # SET memory_limit='2GB', so positions run capped BY THEIR ORACLE
    # (an oracle whose SET prefix were dropped would run uncapped
    # here and its regression would show in the map counts).
    con = duckdb.connect()
    create_views(con, args.sf)
    print(f"# sweep: {len(names)} oracles, ONE shared connection "
          "(no harness cap; each oracle self-caps since r10), "
          f"map budget {budget} ({basis}), start {n_maps()}")
    for pos, name in enumerate(names, 1):
        if name not in ORACLES:
            print(f"{pos:3d} {name:36s} SKIP (no oracle)")
            continue
        try:
            rows = len(con.execute(ORACLES[name]).df())
            err = None
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            rows, err = None, repr(e)[:120]
        # RESET so no position inherits an earlier oracle's SET: after
        # this, each position's limit is exactly what its own SQL sets
        # (the embedded 2 GB since r10; nothing, for ad-hoc SQL)
        con.execute("RESET memory_limit")
        live = n_maps()
        peak = max(peak, live)
        over = live > budget
        failed = failed or over or err is not None
        print(f"{pos:3d} {name:36s} rows={rows!s:>7s} maps={live}"
              + (" <-- OVER BUDGET" if over else "")
              + (f" ERR {err}" if err else ""))
        sys.stdout.flush()
    print(f"# peak {peak} / budget {budget}: "
          + ("FAIL" if failed else "OK"))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
