"""Localization engine: jit-compiled relocalization, tracking, evaluation."""

from pram_tpu.engine.localizer import LocConfig, Localizer, rank_segments

__all__ = ["LocConfig", "Localizer", "rank_segments"]
