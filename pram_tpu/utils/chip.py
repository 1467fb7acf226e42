"""TPU relay availability probe.

The axon relay tunnel can drop for an hour or more mid-session (observed
round 4); when it is down, the first device access in-process HANGS
rather than erroring, so benches must probe from a subprocess with a
timeout and wait for the tunnel to return instead of hanging the caller
forever. Used by bench.py / scripts/bench_*.py before touching jax
devices.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def chip_up(probe_timeout_s: int = 120) -> bool:
    """True if a device access completes in a fresh subprocess.

    The probe must run with the repo cwd and WITHOUT PYTHONPATH (which
    breaks axon PJRT plugin registration — see .claude/skills/verify).
    """
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=probe_timeout_s,
            capture_output=True,
            env=env,
            cwd=os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_chip(
    max_wait_s: int = 1800, probe_timeout_s: int = 120, log=print
) -> bool:
    """Poll until the relay answers or ``max_wait_s`` passes.

    Returns True when up. On False the caller should proceed anyway (its
    own failure mode is the honest signal) — this just converts an
    indefinite hang into a bounded wait.
    """
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        if chip_up(probe_timeout_s):
            if attempt:
                log(f"chip relay back after {attempt} down probes")
            return True
        attempt += 1
        if time.time() >= deadline:
            log(f"chip relay still down after {max_wait_s}s; proceeding")
            return False
        log(f"chip relay down (probe {attempt}); retrying in 60s")
        time.sleep(60)
