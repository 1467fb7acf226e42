"""Distributed execution: process init, device meshes, sharding helpers."""

from pram_tpu.parallel.mesh import (
    initialize_distributed,
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
]
