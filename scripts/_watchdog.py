"""Axon-tunnel watchdog for long TPU scripts.

The axon TPU plugin intermittently wedges NEW client sessions at setup:
threads park in RPC/futex wait, the first device op never completes, and
the process burns no CPU (CLAUDE.md "Environment gotchas"; observed
repeatedly in rounds 2-3). The chip itself recovers the moment the stale
client dies, so the reliable pattern is supervise-and-retry:

    # at the top of a script's __main__, before importing jax:
    from _watchdog import supervise
    supervise()          # parent: respawn until "[preflight]" appears
    main()               # child: runs with WATCHDOG_INNER=1

The child MUST print a line containing ``[preflight]`` as soon as its
first tiny device op completes (see ``soak_nerfpp.py:preflight``). The
parent re-execs the script with the same argv, streams its output
through, and kills+retries if the preflight line does not appear within
``grace_s`` seconds. bench.py carries the same pattern inline
(`_main_with_retry`).
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

MARK = "[preflight]"


def supervise(attempts: int = 6, grace_s: float = 150.0,
              cooldown_s: float = 20.0) -> None:
    """No-op in the child (``WATCHDOG_INNER=1``); in the parent, run the
    current script under a preflight watchdog and ``sys.exit`` with the
    child's final return code. ``WATCHDOG_ATTEMPTS`` / ``WATCHDOG_GRACE_S``
    env vars override the defaults (wedge phases have lasted 40+ min —
    a long unattended run may want a bigger budget than 6x170s)."""
    if os.environ.get("WATCHDOG_INNER"):
        return
    attempts = int(os.environ.get("WATCHDOG_ATTEMPTS", attempts))
    grace_s = float(os.environ.get("WATCHDOG_GRACE_S", grace_s))
    cooldown_s = float(os.environ.get("WATCHDOG_COOLDOWN_S", cooldown_s))
    env = dict(os.environ, WATCHDOG_INNER="1")
    for attempt in range(1, attempts + 1):
        proc = subprocess.Popen(
            [sys.executable, "-u", *sys.argv],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        t0 = time.monotonic()
        ok = False
        try:
            import select

            while True:
                # select, not bare readline: a fully-wedged child emits
                # NOTHING, and a blocking readline would hang the parent
                # past the grace window.
                ready, _, _ = select.select([proc.stdout], [], [], 1.0)
                if ready:
                    line = proc.stdout.readline()
                    if line:
                        sys.stdout.write(line)
                        sys.stdout.flush()
                        if not ok and MARK in line:
                            ok = True
                    elif proc.poll() is not None:
                        break
                elif proc.poll() is not None:
                    break
                if not ok and time.monotonic() - t0 > grace_s:
                    print(f"[watchdog] attempt {attempt}/{attempts}: no "
                          f"{MARK} within {grace_s:.0f}s — axon session "
                          "wedge; killing and retrying", flush=True)
                    proc.kill()
                    proc.wait()
                    break
            if ok:
                rc = proc.wait()
                sys.exit(rc)
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
        time.sleep(cooldown_s)
    print("[watchdog] all attempts wedged", flush=True)
    sys.exit(1)
