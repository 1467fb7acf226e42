"""Scene-sharded localization maps across a device mesh.

At Aachen scale (n_cluster 512, 4096-kpt frames; SURVEY §7 hard-part 5) the
packed point/frame tables no longer fit replicated in one chip's HBM next to
the batch state. This module shards the heavy tables (3D points, per-frame
keypoint tables) row-wise over the mesh's 'data' axis while keeping the small
routing tables (segment->VRF slots, covisibility lists, frame geometry)
replicated, and implements the distributed gathers the localization engine
needs between its compute phases.

Distributed gather = the classic sharded-embedding lookup, all on ICI:
  1. all_gather the (tiny) row indices so every shard sees every query's
     needs;
  2. each shard gathers the rows it owns (ownership-masked, others zero);
  3. psum_scatter sums the one-owner contributions and hands each device
     exactly its own queries' rows.
Exactly one shard owns each valid row, so the sums are exact (no
floating-point reordering); invalid (-1) indices come back as zero rows,
which the engine masks out just like the replicated path's clipped gathers.

The engine composition lives in engine/localizer.py (Localizer with a
ShardedMap); tests/test_sharded_map.py pins it element-wise to the
replicated-map engine on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pram_tpu.maps.device import DeviceMap


def _pad_rows(x: np.ndarray, mult: int, fill=0):
    rows = x.shape[0]
    pad = (-rows) % mult
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, widths, constant_values=fill)


@dataclass(frozen=True)
class ShardedMap:
    """DeviceMap split into replicated routing tables + row-sharded tables.

    Heavy tables are padded to a multiple of the mesh axis size and sharded
    on dim 0; ``rows_per_shard_*`` are the static per-device row counts the
    distributed gathers need.
    """

    # replicated (small)
    seg_vrf_slot: jax.Array  # [S]
    vrf_frame_idx: jax.Array  # [V]
    vrf_covis: jax.Array  # [V, C]
    vrf_ref_point_idx: jax.Array  # [V, Pr]
    frame_R: jax.Array  # [F, 3, 3]
    frame_t: jax.Array  # [F, 3]
    frame_cam: jax.Array  # [F, 8]
    frame_size: jax.Array  # [F, 2]
    # sharded on dim 0 over 'data'
    point_xyz: jax.Array  # [Pp, 3]
    point_desc: jax.Array  # [Pp, D]
    point_seg: jax.Array  # [Pp]
    frame_point_idx: jax.Array  # [Fp, K]
    frame_kp_uv: jax.Array  # [Fp, K, 2]
    frame_kp_score: jax.Array  # [Fp, K]
    frame_kp_mask: jax.Array  # [Fp, K] int8 (psum-friendly)
    # static metadata
    n_points: int
    n_frames: int
    points_per_shard: int
    frames_per_shard: int
    mesh: object
    axis: str = "data"

    def hbm_bytes_per_device(self) -> int:
        """Sharded-table bytes resident per device (for capacity planning)."""
        tot = 0
        for f in (self.point_xyz, self.point_desc, self.point_seg,
                  self.frame_point_idx, self.frame_kp_uv,
                  self.frame_kp_score, self.frame_kp_mask):
            tot += f.nbytes // self.mesh.devices.size
        return tot


def shard_map_tables(
    dmap: DeviceMap, mesh, axis: str = "data", desc_dtype=None
) -> ShardedMap:
    """Build a ShardedMap from a (host or device) DeviceMap."""
    nd = int(np.prod([mesh.shape[a] for a in (axis,)]))
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(axis))

    def put_repl(x):
        return jax.device_put(jnp.asarray(x), repl)

    def put_row(x, fill=0, dtype=None):
        arr = np.asarray(x)
        arr = _pad_rows(arr, nd, fill)
        a = jnp.asarray(arr)
        if dtype is not None:
            a = a.astype(dtype)
        return jax.device_put(a, row)

    n_points = int(dmap.point_xyz.shape[0])
    n_frames = int(dmap.frame_point_idx.shape[0])
    pdesc = dmap.point_desc if desc_dtype is None else jnp.asarray(
        dmap.point_desc
    ).astype(desc_dtype)

    return ShardedMap(
        seg_vrf_slot=put_repl(dmap.seg_vrf_slot),
        vrf_frame_idx=put_repl(dmap.vrf_frame_idx),
        vrf_covis=put_repl(dmap.vrf_covis),
        vrf_ref_point_idx=put_repl(dmap.vrf_ref_point_idx),
        frame_R=put_repl(dmap.frame_R),
        frame_t=put_repl(dmap.frame_t),
        frame_cam=put_repl(dmap.frame_cam),
        frame_size=put_repl(dmap.frame_size),
        point_xyz=put_row(dmap.point_xyz),
        point_desc=put_row(pdesc),
        point_seg=put_row(dmap.point_seg),
        frame_point_idx=put_row(dmap.frame_point_idx, fill=-1),
        frame_kp_uv=put_row(dmap.frame_kp_uv),
        frame_kp_score=put_row(dmap.frame_kp_score),
        frame_kp_mask=put_row(dmap.frame_kp_mask, dtype=jnp.int8),
        n_points=n_points,
        n_frames=n_frames,
        points_per_shard=-(-n_points // nd),
        frames_per_shard=-(-n_frames // nd),
        mesh=mesh,
        axis=axis,
    )


def dist_take(
    local_tab: jax.Array,  # [rows_loc, *row_shape] (this shard's rows)
    idx: jax.Array,  # [b_loc, ...] global row indices (-1 = invalid)
    axis: str,
    rows_per_shard: int,
    *,
    max_chunk_elems: int = 1 << 14,
):
    """Distributed row gather inside shard_map (see module docstring).

    Invalid indices yield zero rows. Chunked along the flattened index axis
    so the [n_dev, ...] intermediate stays bounded regardless of how many
    rows one step requests.
    """
    b_loc = idx.shape[0]
    lead = idx.shape
    flat = idx.reshape(b_loc, -1)
    l_tot = flat.shape[1]
    chunk = max(1, min(l_tot, max_chunk_elems // max(1, b_loc)))
    me = jax.lax.axis_index(axis)
    lo = me * rows_per_shard

    outs = []
    for s in range(0, l_tot, chunk):
        part = flat[:, s : s + chunk]
        idx_all = jax.lax.all_gather(part, axis)  # [nd, b_loc, chunk]
        rel = idx_all - lo
        own = (rel >= 0) & (rel < rows_per_shard) & (idx_all >= 0)
        safe = jnp.clip(rel, 0, rows_per_shard - 1)
        vals = local_tab[safe]  # [nd, b_loc, chunk, *row]
        ownx = own.reshape(own.shape + (1,) * (vals.ndim - own.ndim))
        vals = jnp.where(ownx, vals, jnp.zeros((), vals.dtype))
        outs.append(
            jax.lax.psum_scatter(vals, axis, scatter_dimension=0,
                                 tiled=False)
        )
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return out.reshape(lead + local_tab.shape[1:])
