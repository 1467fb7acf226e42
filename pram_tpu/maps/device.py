"""Device-resident map arrays (pytree) shipped from a host PackedMap."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pram_tpu.maps.packed import PackedMap


class DeviceMap(NamedTuple):
    """HBM-resident localization map (see maps/packed.py for field docs).

    A NamedTuple so it's a pytree: it threads through jit/vmap/shard_map and
    can be device_put once and reused across all queries.
    """

    point_xyz: jax.Array  # [P, 3]
    point_desc: jax.Array  # [P, D]
    point_seg: jax.Array  # [P]
    frame_R: jax.Array  # [F, 3, 3]
    frame_t: jax.Array  # [F, 3]
    frame_cam: jax.Array  # [F, 8]
    frame_size: jax.Array  # [F, 2]
    frame_point_idx: jax.Array  # [F, K]
    frame_kp_uv: jax.Array  # [F, K, 2]
    frame_kp_score: jax.Array  # [F, K]
    frame_kp_mask: jax.Array  # [F, K]
    seg_vrf_slot: jax.Array  # [S]
    vrf_frame_idx: jax.Array  # [V]
    vrf_covis: jax.Array  # [V, C]
    vrf_ref_point_idx: jax.Array  # [V, Pr]


def to_device(pmap: PackedMap, dtype=jnp.float32) -> DeviceMap:
    """Ship a host PackedMap to the default device (or shard it via jax.device_put)."""
    return DeviceMap(
        point_xyz=jnp.asarray(pmap.point_xyz, dtype),
        point_desc=jnp.asarray(pmap.point_desc, dtype),
        point_seg=jnp.asarray(pmap.point_seg, jnp.int32),
        frame_R=jnp.asarray(pmap.frame_R, dtype),
        frame_t=jnp.asarray(pmap.frame_t, dtype),
        frame_cam=jnp.asarray(pmap.frame_cam, dtype),
        frame_size=jnp.asarray(pmap.frame_size, dtype),
        frame_point_idx=jnp.asarray(pmap.frame_point_idx, jnp.int32),
        frame_kp_uv=jnp.asarray(pmap.frame_kp_uv, dtype),
        frame_kp_score=jnp.asarray(pmap.frame_kp_score, dtype),
        frame_kp_mask=jnp.asarray(pmap.frame_kp_mask),
        seg_vrf_slot=jnp.asarray(pmap.seg_vrf_slot, jnp.int32),
        vrf_frame_idx=jnp.asarray(pmap.vrf_frame_idx, jnp.int32),
        vrf_covis=jnp.asarray(pmap.vrf_covis, jnp.int32),
        vrf_ref_point_idx=jnp.asarray(pmap.vrf_ref_point_idx, jnp.int32),
    )
