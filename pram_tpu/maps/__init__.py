"""Map layer: COLMAP model I/O and packed-array localization maps."""

from pram_tpu.maps.colmap_io import (
    ColmapCamera,
    ColmapImage,
    ColmapPoint3D,
    read_model,
    write_model,
    read_compressed_model,
    write_compressed_model,
)

__all__ = [
    "ColmapCamera",
    "ColmapImage",
    "ColmapPoint3D",
    "read_model",
    "write_model",
    "read_compressed_model",
    "write_compressed_model",
]
