"""The bench must emit ONE parseable JSON line even when the chip relay
is down (VERDICT r4 weak #1: round 4's driver run recorded NOTHING
because the fallback sat behind a wait longer than the driver budget).

BENCH_SIM_OUTAGE=1 forces the outage path without burning probe time, so
this runs everywhere (CPU CI included).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )


def test_outage_emits_parseable_line():
    r = _run_bench({"BENCH_SIM_OUTAGE": "1", "PRAM_INT8_CONV": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert lines, "no output"
    out = json.loads(lines[-1])
    # headline fields nulled: a replay must not parse as a measurement
    assert out["chip_unavailable"] is True
    assert out["value"] is None
    assert out["runs"] is None
    assert out["metric"] == "7scenes_relocalization_throughput"
    # the requested flags of THIS invocation are recorded
    assert out["requested_env_flags"].get("PRAM_INT8_CONV") == "1"
    # the carried-over measurement lives under last_good only
    lg_path = os.path.join(REPO, "weights", "last_bench.json")
    if os.path.exists(lg_path):
        assert out["last_good"] is not None
        assert out["last_good"].get("value")


def test_outage_line_without_cache(tmp_path, monkeypatch):
    """Even with no last-good cache the line must parse (no SystemExit)."""
    # point the bench at an empty weights dir by running from a copy? No:
    # the cache path is derived from the bench file location, so simulate
    # by asserting the emitted structure tolerates last_good=None — the
    # code path is identical except for the json.load; exercise it by
    # loading bench.py's main with a monkeypatched open? Simplest honest
    # check: the emitted line above already parses when last_good is
    # missing because the default is None before the try block.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    printed = []
    monkeypatch.setenv("BENCH_SIM_OUTAGE", "1")
    monkeypatch.setattr("builtins.print", lambda *a, **k: printed.append(a))
    real_open = open

    def no_cache_open(path, *a, **k):
        if str(path).endswith("last_bench.json"):
            raise OSError("simulated missing cache")
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", no_cache_open)
    mod.main()
    assert printed
    out = json.loads(printed[-1][0])
    assert out["chip_unavailable"] is True
    assert out["last_good"] is None
    assert out["value"] is None
