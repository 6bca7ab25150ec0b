"""Bounded-retry wrapper around the reference binary.

The reference's ThreadPool occasionally deadlocks at startup (all threads
futex-wait, 0 CPU; observed 2026-08-20/21).  bench.py guards its calls with
a bounded timeout + retry; tests calling the binary with one bare 600 s
timeout flaked a full-suite run (VERDICT r4 weak #7).  Every test call goes
through run_reference: short per-attempt timeout (the tiny test datasets
finish in seconds when the pool starts), a few retries, and a hard failure
with the captured stderr otherwise.
"""

import subprocess

REF_BIN = "/root/repo/.ref_build/varigraph"


def run_reference(args, cwd=None, attempt_timeout=120, attempts=3):
    last = None
    for _ in range(attempts):
        try:
            r = subprocess.run(
                [REF_BIN] + list(args), capture_output=True, text=True,
                timeout=attempt_timeout, cwd=cwd,
            )
        except subprocess.TimeoutExpired as e:
            last = e
            continue  # startup deadlock: retry
        if r.returncode == 0:
            return r
        last = r
    if isinstance(last, subprocess.TimeoutExpired):
        raise AssertionError(
            f"reference binary timed out {attempts}x (thread-pool startup "
            f"deadlock?): {args}"
        )
    raise AssertionError(
        f"reference binary failed rc={last.returncode}: {last.stderr[-400:]}"
    )
