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

    The probe runs with the CALLER's env first — it must predict whether
    the caller's own device access would succeed. Environments differ in
    how the axon PJRT plugin registers: in one observed setup PYTHONPATH
    broke registration (the probe had to strip it); in another the plugin
    rides PYTHONPATH (/root/.axon_site via sitecustomize) and stripping it
    makes every probe fail with "Backend 'axon' is not in the list of
    known backends" while the chip is fine — a phantom outage that nulled
    a whole bench round. So: try the unmodified env, then the stripped
    env; up under either counts (the caller runs with the unmodified one).
    """
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    stripped = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    for env in (dict(os.environ), stripped):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s,
                capture_output=True,
                env=env,
                cwd=repo,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            # a hang (not an error) is the relay-down signature; the
            # second env won't unhang it, but costs one more bounded try
            pass
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
