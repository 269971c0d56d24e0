#!/usr/bin/env python
"""Full driver-gate mirror for a staged window: Spark vs DuckDB at
sf0.01 (rows + schema + driver-faithful value hash) for every name in
a window file.

``tools/window_sweep.py`` protects the DuckDB side (oracle memory /
mmap budget, single shared connection, window order). This tool is
the OTHER half: it runs each window entry's SPARK query and compares
it against its oracle exactly the way the driver's t2 gate does
(tests/oracle_harness.py — the same canonicalization, the same
dtype-faithful hash), at the driver's sf0.01 rather than the CI
parity suite's sf0.001. r11 introduced it after staging two windows
in one round: the failure class it catches is data-dependent drift
that is green at sf0.001 and red at sf0.01 (value distributions,
group cardinalities, approximation envelopes).

Usage:
    python tools/window_precheck.py --window tools/r12_window_names.txt
    python tools/window_precheck.py --window ... --sf /root/testdata/sf0.01

Exit 1 if any entry mismatches; prints per-entry status as it goes.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", default="8")
    args = ap.parse_args()

    from oracle_harness import compare, duck_connection

    from idr_data_pipelines_spark.queries import ORACLES, QUERIES
    from idr_data_pipelines_spark.session import get_spark

    with open(args.window) as fh:
        names = [ln.strip() for ln in fh if ln.strip()]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"not in QUERIES: {unknown}")

    spark = get_spark(
        app_name="window-precheck",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    duck = duck_connection(args.sf)

    bad: list[tuple[str, object]] = []
    for i, n in enumerate(names):
        if n not in ORACLES:
            bad.append((n, "no oracle"))
            print(f"{i + 1}/{len(names)} {n} NO-ORACLE", flush=True)
            continue
        try:
            res = compare(QUERIES[n](spark, args.sf), duck, ORACLES[n])
            ok = (
                res["rowcount_match"]
                and res["schema_match"]
                and res["values_match"]
            )
            if not ok:
                bad.append(
                    (
                        n,
                        {
                            k: res[k]
                            for k in (
                                "rows_spark",
                                "rows_oracle",
                                "cols_spark",
                                "cols_oracle",
                                "first_diff",
                            )
                        },
                    )
                )
            print(
                f"{i + 1}/{len(names)} {n} {'OK' if ok else 'FAIL'}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            bad.append((n, repr(exc)[:300]))
            print(f"{i + 1}/{len(names)} {n} ERR {repr(exc)[:120]}", flush=True)
    if bad:
        print("\nFAILURES:")
        for n, detail in bad:
            print(f"  {n}: {detail}")
        sys.exit(1)
    print(f"\nall {len(names)} window entries match their oracles at {args.sf}")


if __name__ == "__main__":
    main()
