#!/usr/bin/env python
"""Atomic full-suite certification (r12 VERDICT item 3).

Round 12 closed on a "suite green" claim (commit f2b51a8) that a LATER
commit (c1e720a, a new registry entry) invalidated — the plan gate went
red and nobody saw it, because nothing tied the certification to the
commit graph. This tool makes the tie explicit:

- ``certify``: run the WHOLE test suite (``pytest tests/``); on success
  write ``CERTIFICATION.json`` = {commit, dirty, timestamp, summary}.
  Refuses to certify a dirty working tree touching certified paths —
  a cert must name a commit the suite actually ran against.
- ``check``: fail (exit 1) if any commit touching the certified paths
  (``idr_data_pipelines_spark/``, ``tests/``, ``__spark_entry__.py``,
  ``bench.py``, ``conftest.py``) postdates the certified commit, or if
  the working tree is dirty on those paths, or if no certification
  exists. This is what a round-close (and tools/rotate_window.py
  users) should run LAST: green check == the recorded suite run covers
  every code change in the round.

Usage:
    python tools/certify_suite.py certify            # ~30 min
    python tools/certify_suite.py certify --pytest-args='-x -q'
    python tools/certify_suite.py check
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import shlex
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CERT_PATH = os.path.join(REPO, "CERTIFICATION.json")
# paths whose changes invalidate a suite certification
CERTIFIED_PATHS = [
    "idr_data_pipelines_spark",
    "tests",
    "__spark_entry__.py",
    "bench.py",
    "conftest.py",
]


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout.strip()


def _dirty_certified_paths() -> list[str]:
    out = _git("status", "--porcelain", "--", *CERTIFIED_PATHS)
    return [ln for ln in out.splitlines() if ln.strip()]


# Output-only pytest flags a certification run may carry. Anything else
# (-k/-m expressions, paths, --ignore, --lf, ...) can NARROW collection,
# which would let a partial run mint a cert that ``check`` treats as
# full-suite coverage (r13 ADVICE item 2).
_SAFE_PYTEST_ARGS = re.compile(
    r"^(-q|-v|-x|-r[a-zA-Z]*|--tb=\w+|--color=\w+|--durations=\d+"
    r"|--maxfail=\d+|-p|no:cacheprovider|no:randomly)$"
)


def _unsafe_pytest_args(pytest_args: str) -> list[str]:
    return [
        a
        for a in shlex.split(pytest_args)
        if not _SAFE_PYTEST_ARGS.match(a)
    ]


def certify(pytest_args: str) -> int:
    unsafe = _unsafe_pytest_args(pytest_args)
    if unsafe:
        print(
            "REFUSED: --pytest-args may only carry output-control flags "
            f"(got {unsafe!r}); selection flags or paths would let a "
            "narrowed run mint a full-suite certification",
            file=sys.stderr,
        )
        return 1
    dirty = _dirty_certified_paths()
    if dirty:
        print(
            "REFUSED: working tree is dirty on certified paths — commit "
            "first so the certification names a real commit:\n  "
            + "\n  ".join(dirty),
            file=sys.stderr,
        )
        return 1
    head = _git("rev-parse", "HEAD")
    cmd = [sys.executable, "-m", "pytest", "tests/"] + shlex.split(
        pytest_args
    )
    print(f"# certifying {head[:12]} with: {' '.join(cmd)}", file=sys.stderr)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    tail = (proc.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else ""
    print(proc.stdout[-2000:], file=sys.stderr)
    if proc.returncode != 0:
        print(
            f"suite NOT green (exit {proc.returncode}) — no certification "
            "written",
            file=sys.stderr,
        )
        return proc.returncode
    m = re.search(r"(\d+) passed", summary)
    cert = {
        "commit": head,
        "passed": int(m.group(1)) if m else None,
        "timestamp_utc": datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat(timespec="seconds"),
        "summary": summary,
        "pytest_args": pytest_args,
        "certified_paths": CERTIFIED_PATHS,
    }
    with open(CERT_PATH, "w") as fh:
        json.dump(cert, fh, indent=2)
        fh.write("\n")
    print(f"certified: {json.dumps(cert)}")
    return 0


def check() -> int:
    if not os.path.exists(CERT_PATH):
        print(
            "FAIL: no CERTIFICATION.json — run "
            "`python tools/certify_suite.py certify` after the last code "
            "commit",
            file=sys.stderr,
        )
        return 1
    with open(CERT_PATH) as fh:
        cert = json.load(fh)
    commit = cert["commit"]
    # commits touching certified paths AFTER the certified commit
    stale = _git(
        "log", "--oneline", f"{commit}..HEAD", "--", *CERTIFIED_PATHS
    )
    dirty = _dirty_certified_paths()
    problems = []
    if stale:
        problems.append(
            "commits touching certified paths postdate the certification "
            f"({commit[:12]}):\n  " + stale.replace("\n", "\n  ")
        )
    if dirty:
        problems.append(
            "working tree dirty on certified paths:\n  " + "\n  ".join(dirty)
        )
    if problems:
        print("FAIL: certification is STALE —", file=sys.stderr)
        for p in problems:
            print(p, file=sys.stderr)
        print(
            "re-run `python tools/certify_suite.py certify` after the last "
            "code commit",
            file=sys.stderr,
        )
        return 1
    print(
        f"OK: suite certification {commit[:12]} "
        f"({cert['timestamp_utc']}, {cert['summary']!r}) covers HEAD"
    )
    return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["certify", "check"])
    ap.add_argument(
        "--pytest-args",
        default="-q",
        help="extra args for pytest (default: -q). Values starting "
        "with a dash need the equals form: --pytest-args='-x -q' "
        "(argparse otherwise eats them as options)",
    )
    args = ap.parse_args()
    sys.exit(
        certify(args.pytest_args) if args.mode == "certify" else check()
    )


if __name__ == "__main__":
    main()
