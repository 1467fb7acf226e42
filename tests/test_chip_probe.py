"""Relay availability probe (utils/chip.py) — bounded-wait semantics."""

import pram_tpu.utils.chip as chip


def test_wait_returns_true_immediately_when_up(monkeypatch):
    monkeypatch.setattr(chip, "chip_up", lambda *a, **kw: True)
    assert chip.wait_for_chip(max_wait_s=0, log=lambda s: None)


def test_wait_bounded_when_down(monkeypatch):
    monkeypatch.setattr(chip, "chip_up", lambda *a, **kw: False)
    msgs = []
    assert not chip.wait_for_chip(max_wait_s=0, log=msgs.append)
    assert "proceeding" in msgs[-1]


def test_chip_up_probes_with_callers_env(monkeypatch):
    """Regression for the r5 phantom outage: the axon plugin registers via
    PYTHONPATH (sitecustomize) in this environment, so a probe that strips
    PYTHONPATH fails while the caller's own device access would succeed.
    chip_up must try the unmodified env (and count it)."""
    import subprocess

    calls = []

    def fake_run(cmd, timeout, capture_output, env, cwd):
        calls.append("PYTHONPATH" in env)

        class R:
            returncode = 0 if "PYTHONPATH" in env else 1

        return R()

    monkeypatch.setenv("PYTHONPATH", "/root/.axon_site")
    monkeypatch.setattr(subprocess, "run", fake_run)
    assert chip.chip_up()
    assert calls[0] is True  # caller's env tried first


def test_chip_up_falls_back_to_stripped_env(monkeypatch):
    """The r4-era environment needed PYTHONPATH stripped; both orders
    must report up when either env reaches the chip."""
    import subprocess

    def fake_run(cmd, timeout, capture_output, env, cwd):
        class R:
            returncode = 1 if "PYTHONPATH" in env else 0

        return R()

    monkeypatch.setenv("PYTHONPATH", "/breaks/axon")
    monkeypatch.setattr(subprocess, "run", fake_run)
    assert chip.chip_up()
