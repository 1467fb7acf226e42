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
