#!/usr/bin/env python
"""Rotate the driver correctness window (the FIRST 50 entries of
``QUERIES``) without touching any query definition.

The driver records correctness rows for the first 50 registry entries
only, so verification freshness is a pure ordering question. This tool
appends (or replaces) a marker-delimited epilogue at the end of
``queries.py`` that rebuilds the dict with a chosen 50-name window
first — definitions, comments and the underlying literal order stay
exactly where they are, and re-running the tool is idempotent.

Default window = the 50 entries currently sitting at positions 50–99
(the staged next-round candidates; see the registry staging comment),
with streaming entries moved to the window tail in case the driver's
per-round cap is time-based.

Usage:
    python tools/rotate_window.py --dry-run       # print the plan
    python tools/rotate_window.py --round r08     # write the epilogue
    python tools/rotate_window.py --round r08 --names-file picks.txt

After writing, re-sweep the new window before committing:
    python -m pytest tests/test_oracle_parity.py -q
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_PY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "idr_data_pipelines_spark",
    "queries.py",
)
MARK_BEGIN = "# --- driver-window rotation epilogue (tools/rotate_window.py)"
MARK_END = "# --- end rotation epilogue"
WINDOW = 50


def staged_window(names: list[str], oracles: set[str]) -> list[str]:
    """The next window: current positions 50–149 filtered to oracled
    entries, first 50, streaming entries moved to the tail."""
    candidates = [n for n in names[WINDOW : WINDOW + 100] if n in oracles][
        :WINDOW
    ]
    batch = [n for n in candidates if "stream" not in n]
    tail = [n for n in candidates if "stream" in n]
    return batch + tail


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", default="rNN", help="label for the epilogue")
    ap.add_argument("--names-file", help="file with one window name per line")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    from idr_data_pipelines_spark.queries import NO_ORACLE, ORACLES, QUERIES

    names = list(QUERIES)
    if args.names_file:
        with open(args.names_file) as fh:
            window = [ln.strip() for ln in fh if ln.strip()]
    else:
        # the default staging reads positions 50-149 of the IMPORTED
        # dict — valid only before any epilogue exists. After a
        # rotation those positions start with the just-retired window,
        # so re-running the default would silently stage stale picks:
        # refuse and require an explicit list instead.
        if MARK_BEGIN in open(QUERIES_PY).read():
            sys.exit(
                "a rotation epilogue already exists; the positional "
                "default would stage the retired window — pass the "
                "next window explicitly via --names-file"
            )
        window = staged_window(names, set(ORACLES))

    # invariants: exactly one window, every pick oracled and known
    assert len(window) == WINDOW, f"need {WINDOW} names, got {len(window)}"
    assert len(set(window)) == WINDOW, "duplicate names in window"
    unknown = [n for n in window if n not in QUERIES]
    assert not unknown, f"not in QUERIES: {unknown}"
    rowsonly = [n for n in window if n in NO_ORACLE]
    assert not rowsonly, f"NO_ORACLE entries can't be window picks: {rowsonly}"

    print(f"# planned {args.round} window ({WINDOW} entries):")
    for i in range(0, WINDOW, 5):
        print("  ", window[i : i + 5])
    if args.dry_run:
        return

    body = (
        f"{MARK_BEGIN}\n"
        f"# {args.round}: promote the staged picks into the driver window;\n"
        "# every other entry keeps its literal order below them.\n"
        f"_WINDOW_{args.round.upper()} = [\n"
        + "".join(f'    "{n}",\n' for n in window)
        + "]\n"
        "QUERIES = {\n"
        f"    n: QUERIES[n]\n"
        f"    for n in _WINDOW_{args.round.upper()}\n"
        f"    + [k for k in QUERIES if k not in set(_WINDOW_{args.round.upper()})]\n"
        "}\n"
        f"{MARK_END}\n"
    )
    src = open(QUERIES_PY).read()
    pat = re.compile(
        re.escape(MARK_BEGIN) + r".*?" + re.escape(MARK_END) + r"\n?",
        re.S,
    )
    if pat.search(src):
        src = pat.sub(body, src)
    else:
        src = src.rstrip("\n") + "\n\n\n" + body
    open(QUERIES_PY, "w").write(src)
    print(f"wrote rotation epilogue to {QUERIES_PY}")
    print("next: python -m pytest tests/test_oracle_parity.py -q")


if __name__ == "__main__":
    main()
