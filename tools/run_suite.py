#!/usr/bin/env python
"""Run the full test suite one pytest process per file.

A single monolithic `pytest tests/` process accumulates >7 GB RSS across the
232-test suite (jax CPU client + torch reference models + tf exporters all
live in one interpreter) and can die with a fatal interpreter error late in
the run. Per-file processes cap memory at the single-file high-water mark and
give the same coverage; this is the supported way to run everything.

Usage: python tools/run_suite.py [-m MARKER] [--timeout SEC]
Prints one status line per file and a final tally; exit code 1 on any failure.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", dest="marker", default=None, help="pytest -m marker expression (e.g. 'not slow')")
    ap.add_argument("--timeout", type=int, default=3600, help="per-file timeout seconds")
    args = ap.parse_args()

    tests_dir = Path(__file__).resolve().parent.parent / "tests"
    files = sorted(tests_dir.glob("test_*.py"))
    failures = []
    t_total = time.time()
    for f in files:
        cmd = [sys.executable, "-m", "pytest", str(f), "-q"]
        if args.marker:
            cmd += ["-m", args.marker]
        t0 = time.time()
        try:
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=args.timeout)
        except subprocess.TimeoutExpired:
            failures.append(f.name)
            print(f"{f.name:<32} TIMEOUT after {args.timeout}s")
            continue
        tail = (r.stdout or "").strip().splitlines()
        last = tail[-1] if tail else ""
        # pytest exits 5 when a marker deselects every test in the file
        ok = r.returncode in (0, 5)
        if not ok:
            failures.append(f.name)
        print(f"{f.name:<32} {'ok' if ok else 'FAIL'}  {time.time() - t0:6.1f}s  {last[:80]}")
    print(f"\n{len(files) - len(failures)}/{len(files)} files green in {(time.time() - t_total) / 60:.1f} min")
    if failures:
        print("failures:", ", ".join(failures))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
