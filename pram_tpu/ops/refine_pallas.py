"""Fused projection-refinement NN gating (Pallas, TPU).

refine_projection_core (engine/localizer.py) matches query descriptors to
the projected covisible point set with a reprojection gate and a top-2
ratio test. The XLA formulation materializes several ``[B, N, P]`` f32
tensors in HBM (similarity, descriptor distance, pairwise projection error,
gated distance — ~0.5 GB of round trips at the bench shape). This kernel
computes everything on the ``[N, P]`` tile in VMEM: one MXU similarity
matmul, the pairwise gate from planar coordinate rows, top-2 by
min/argmin + masked-second-min, and emits only the per-query NN index and
keep flag.

Semantics match engine/localizer.py:refine_projection_core exactly:
  dist = sqrt(max(2 - 2*sim + 1e-6, 0));  +100 outside the projection gate;
  keep = (d1/max(d2, 1e-9) <= ratio) & (d1 < 100) & query_mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _refine_kernel(q_ref, p_ref, qrows_ref, prows_ref, sc_ref, out_ref,
                   *, pblocks, pblk):
    """One frame: query descs [N, D] x point block [pblk, D] -> NN state.

    qrows: [8, N] planar (kx, ky, qmask, pad...); prows: [8, P] planar
    (ux, uy, in_img, pad...). sc (SMEM): [gate_radius, ratio, 0, 0].
    Accumulates running (d1, d2, idx) across point blocks in the output
    rows; finalizes keep on the last block.
    out rows: 0 nn_idx, 1 d1, 2 d2, 3 keep.
    """
    j = pl.program_id(1) if pblocks > 1 else 0
    gate_r = sc_ref[0, 0]
    ratio = sc_ref[0, 1]

    sim = jax.lax.dot_general(
        q_ref[0], p_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, pblk]
    dist = jnp.sqrt(jnp.maximum(2.0 - 2.0 * sim + 1e-6, 0.0))

    # pairwise projection error: rows are queries, so query coords must be
    # columns — qrows are stored transposed as [N, 8] by the caller
    kxc = qrows_ref[0, :, 0:1]  # [N, 1]
    kyc = qrows_ref[0, :, 1:2]
    ux = prows_ref[0, 0:1, :]  # [1, pblk]
    uy = prows_ref[0, 1:2, :]
    inb = prows_ref[0, 2:3, :] > 0.5  # [1, pblk]
    dx = kxc - ux
    dy = kyc - uy
    err2 = dx * dx + dy * dy
    gate = (err2 < gate_r * gate_r) & inb
    dist = jnp.where(gate, dist, dist + 100.0)

    # block-local top-2
    base = jnp.float32(j * pblk)
    idx_i = jnp.argmin(dist, axis=-1, keepdims=True)  # int32 [N, 1]
    d1_l = jnp.min(dist, axis=-1, keepdims=True)
    # Mosaic's iota is integer-only; compare in int32
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    d2_l = jnp.min(
        jnp.where(cols == idx_i, jnp.inf, dist), axis=-1, keepdims=True
    )
    idx_l = idx_i.astype(jnp.float32) + base

    if pblocks == 1:
        idx, d1, d2 = idx_l, d1_l, d2_l
    else:
        @pl.when(j == 0)
        def _init():
            out_ref[0, :, 0:1] = idx_l
            out_ref[0, :, 1:2] = d1_l
            out_ref[0, :, 2:3] = d2_l

        @pl.when(j > 0)
        def _merge():
            pi = out_ref[0, :, 0:1]
            p1 = out_ref[0, :, 1:2]
            p2 = out_ref[0, :, 2:3]
            # merge two (d1, d2) candidate sets
            new1 = jnp.minimum(p1, d1_l)
            new_idx = jnp.where(d1_l < p1, idx_l, pi)
            new2 = jnp.minimum(jnp.maximum(p1, d1_l), jnp.minimum(p2, d2_l))
            out_ref[0, :, 0:1] = new_idx
            out_ref[0, :, 1:2] = new1
            out_ref[0, :, 2:3] = new2

    is_last = j == pblocks - 1
    if pblocks == 1:
        qm = qrows_ref[0, :, 2:3] > 0.5  # [N, 1]
        keep = (
            (d1 / jnp.maximum(d2, 1e-9) <= ratio) & (d1 < 100.0) & qm
        )
        out_ref[0, :, 0:1] = idx
        out_ref[0, :, 1:2] = d1
        out_ref[0, :, 2:3] = d2
        out_ref[0, :, 3:4] = keep.astype(jnp.float32)
    else:
        @pl.when(is_last)
        def _finalize():
            qm = qrows_ref[0, :, 2:3] > 0.5
            d1 = out_ref[0, :, 1:2]
            d2 = out_ref[0, :, 2:3]
            keep = (
                (d1 / jnp.maximum(d2, 1e-9) <= ratio) & (d1 < 100.0) & qm
            )
            out_ref[0, :, 3:4] = keep.astype(jnp.float32)


def _pick_pblk(n: int, p: int, dd: int, itemsize: int):
    """Largest point-block whose VMEM residents fit: the [n, pblk] f32
    similarity tile dominates (the r3 gate ignored n and OOM'd at the
    Aachen 4096-query shape: 4096 x 1024 x 4 = 16.7 MB > the 16 MB limit)."""
    budget = 12 << 20
    fixed = n * dd * itemsize + n * 8 * 4 + n * 8 * 4  # q descs + row tables
    for pblk in (p, 4096, 2048, 1024, 512, 256, 128):
        if pblk > p or p % pblk:
            continue
        # the kernel stacks ~2.5 [n, pblk] f32 temporaries (similarity +
        # pixel-distance gate + merge scratch; measured 19.09 MB scoped at
        # n=4096, pblk=512 before this factor)
        sim = int(2.5 * n * pblk * 4)
        pres = pblk * dd * itemsize + 8 * pblk * 4
        if fixed + sim + pres <= budget:
            return pblk
    return None


def refine_nn_supported(n: int, p: int, dd: int = 128, itemsize: int = 2) -> bool:
    return n % 8 == 0 and _pick_pblk(n, p, dd, itemsize) is not None


def refine_nn_pallas(
    descs: jax.Array,  # [N, D] query descriptors
    pdesc: jax.Array,  # [P, D] point descriptors
    kpts: jax.Array,  # [N, 2]
    uv: jax.Array,  # [P, 2] projected points
    in_img: jax.Array,  # [P] bool (validity incl. cheirality)
    qmask: jax.Array,  # [N] bool
    gate_radius,  # 2 * threshold
    ratio,  # cfg.projection_ratio
    *,
    interpret: bool = False,
):
    """Returns (nn_idx int32 [N], d1 [N], keep bool [N]) — the top-2 ratio
    NN of refine_projection_core without the [N, P] HBM intermediates."""
    n, dd = descs.shape
    p = pdesc.shape[0]
    pblk = _pick_pblk(n, p, dd, descs.dtype.itemsize)
    if pblk is None:
        raise ValueError(
            f"refine_nn_pallas: no point block of p={p} fits VMEM at n={n} "
            "— gate call sites with refine_nn_supported()"
        )
    pblocks = p // pblk

    qrows = jnp.concatenate(
        [
            kpts.astype(jnp.float32),
            qmask.astype(jnp.float32)[:, None],
            jnp.zeros((n, 5), jnp.float32),
        ],
        axis=1,
    )  # [N, 8]
    prows = jnp.stack(
        [
            uv[:, 0].astype(jnp.float32),
            uv[:, 1].astype(jnp.float32),
            in_img.astype(jnp.float32),
            jnp.zeros((p,), jnp.float32),
            jnp.zeros((p,), jnp.float32),
            jnp.zeros((p,), jnp.float32),
            jnp.zeros((p,), jnp.float32),
            jnp.zeros((p,), jnp.float32),
        ],
        axis=0,
    )  # [8, P]
    sc = jnp.stack(
        [
            jnp.asarray(gate_radius, jnp.float32),
            jnp.asarray(ratio, jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        ]
    ).reshape(1, 4)

    out = pl.pallas_call(
        functools.partial(_refine_kernel, pblocks=pblocks, pblk=pblk),
        grid=(1, pblocks),
        in_specs=[
            pl.BlockSpec((1, n, dd), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pblk, dd), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 8), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, pblk), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, n, 8), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n, 8), jnp.float32),
        interpret=interpret,
    )(
        descs[None], pdesc[None], qrows[None], prows[None], sc,
    )
    row = out[0]
    return (
        row[:, 0].astype(jnp.int32),
        row[:, 1],
        row[:, 3] > 0.5,
    )
