"""Training/eval data pipeline: scene datasets, multi-scene composition, batching."""

from pram_tpu.data.scene import SceneDataset, SceneSpec, normalize_size
from pram_tpu.data.multiscene import MultiSceneDataset
from pram_tpu.data.loader import BatchLoader, collate

__all__ = [
    "SceneDataset",
    "SceneSpec",
    "normalize_size",
    "MultiSceneDataset",
    "BatchLoader",
    "collate",
]
