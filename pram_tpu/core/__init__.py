"""Core utilities: typed configs, distributed init, logging."""

from pram_tpu.core.config import ExperimentConfig, load_config

__all__ = ["ExperimentConfig", "load_config"]
