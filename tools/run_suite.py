"""Segfault-proof test-suite runner: one pytest subprocess per test file.

jaxlib's XLA:CPU backend_compile_and_load segfaults INTERMITTENTLY late in
a long-lived process (observed repeatedly ~128 tests into a monolithic
`pytest tests/` run on this box; docs/jaxlib_cpu_segfault.md). A single
crash there takes the whole run's result with it. This runner shards the
suite across per-file subprocesses so a crash is contained to one file,
and retries a crashed file once in a fresh process (fresh processes pass
reliably). rc=0 means every file's tests passed.

Usage: python tools/run_suite.py [pytest-target ...] [-- pytest-args]
  Default targets: every tests/test_*.py, one subprocess each.
  S3D_SUITE_TIMEOUT: per-file timeout seconds (default 3600).
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys
import time

CRASH_RCS = {-11, -6, 134, 139}      # SIGSEGV / SIGABRT, shell-style too


def run_file(target: str, extra: list[str], timeout: int):
    env = dict(os.environ)
    cmd = [sys.executable, "-m", "pytest", "-q", target] + extra
    t0 = time.time()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, env=env)
        rc, out = r.returncode, r.stdout + r.stderr
    except subprocess.TimeoutExpired as e:
        rc = 124
        out = ((e.stdout or b"").decode(errors="replace") if
               isinstance(e.stdout, bytes) else (e.stdout or "")) + \
            "\n== TIMEOUT =="
    return rc, out, time.time() - t0


def summarize(out: str) -> str:
    for line in reversed(out.strip().splitlines()):
        if re.search(r"\d+ (passed|failed|error|skipped|xfailed)", line):
            return line.strip().strip("= ")
    return "(no pytest summary)"


def main(argv: list[str]) -> int:
    if "--" in argv:
        cut = argv.index("--")
        targets, extra = argv[:cut], argv[cut + 1:]
    else:
        targets, extra = argv, []
    if not targets:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        targets = sorted(glob.glob(os.path.join(here, "tests",
                                                "test_*.py")))
    timeout = int(os.environ.get("S3D_SUITE_TIMEOUT", "3600"))

    failures = []
    for target in targets:
        name = os.path.basename(target.split("::")[0])
        rc, out, dt = run_file(target, extra, timeout)
        retried = ""
        if rc in CRASH_RCS:
            # jaxlib compile segfault: fresh process, one retry
            rc, out, dt2 = run_file(target, extra, timeout)
            dt += dt2
            retried = " [retried after crash]"
        status = "ok" if rc == 0 else f"FAIL rc={rc}"
        print(f"{name:32s} {status:12s} {dt:7.1f}s  "
              f"{summarize(out)}{retried}", flush=True)
        if rc != 0:
            failures.append((target, rc, out))

    if failures:
        print(f"\n{len(failures)} file(s) failed:", flush=True)
        for target, rc, out in failures:
            print(f"\n=== {target} (rc={rc}) ===\n{out[-4000:]}",
                  flush=True)
        return 1
    print("\nALL FILES PASSED", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
