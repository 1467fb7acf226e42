"""Neural network models: extractors, recognition heads, matchers."""

from pram_tpu.models.registry import build_matcher, build_recognizer, build_extractor

__all__ = ["build_matcher", "build_recognizer", "build_extractor"]
