"""Single-command test runner with per-file process isolation.

``python -m pytest tests/`` in ONE process segfaults reproducibly on this
container: after ~150 accumulated XLA CPU compilations the NEXT compile
SIGSEGVs inside ``jax/_src/compiler.py backend_compile_and_load`` (exit
139; faulthandler stacks recorded in rounds 4 and 5 — different tests
each time, always the same frame, and each crashing test passes alone
and in its own file's run).  That is accumulated-compiler-state
corruption upstream in XLA CPU, not a suite bug — every test passes when
the compile count per process stays bounded.

This runner executes each ``tests/test_*.py`` in its own subprocess
(bounding per-process compiles to a file's worth), streams the per-file
summaries, and exits non-zero if ANY file fails — the reliable one
command the README points at:

    python run_tests.py            # whole suite, isolated per file
    python run_tests.py accel io   # only matching test files
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time


def main() -> int:
    files = sorted(glob.glob(os.path.join("tests", "test_*.py")))
    if len(sys.argv) > 1:
        keys = sys.argv[1:]
        files = [f for f in files if any(k in os.path.basename(f)
                                         for k in keys)]
    if not files:
        print("no test files matched", file=sys.stderr)
        return 2

    t0 = time.time()
    failed = []
    for f in files:
        tf = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", f, "-q", "--no-header"],
            capture_output=True, text=True,
        )
        tail = [ln for ln in proc.stdout.strip().splitlines() if ln][-1:]
        status = "ok" if proc.returncode == 0 else f"FAIL rc={proc.returncode}"
        print(f"{f:40s} {status:12s} {time.time() - tf:7.1f}s  "
              f"{tail[0] if tail else ''}", flush=True)
        if proc.returncode != 0:
            failed.append(f)
            sys.stdout.write(proc.stdout[-4000:])
            sys.stderr.write(proc.stderr[-2000:])
    print(f"\ntotal {time.time() - t0:.0f}s — "
          + ("ALL GREEN" if not failed else f"FAILED: {failed}"))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
