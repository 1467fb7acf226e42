"""Fused Pallas NMS: the whole simple_nms chain in one VMEM-resident pass.

The XLA formulation (ops/nms.py) issues 14 reduce_windows over the
[B, H, W] score map — each one a full HBM round trip, and minor-dim sliding
windows lower to long lane-shift chains (measured 4.7 ms/b32 at 480x640).
This kernel reads each score tile once, runs all five max-pool stages of
simple_nms (detect + 2 recovery iterations) on VMEM values with
log-composed sliding maxima (~5 shift+max steps for a 9-wide window instead
of 8 comparisons), and writes the suppressed map once.

Tiles carry a (8-aligned) 24-row halo covering the five chained radius-4
pools; the caller pads H with zeros, which is equivalent to the reference's
-inf SAME padding for non-negative score maps (nets/sfd2.py:20-35
semantics — scores are softmax outputs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _shift(x, s, axis):
    """out[i] = x[i+s] with out-of-range positions filled with -inf."""
    n = x.shape[axis]
    if s == 0:
        return x
    rolled = pltpu.roll(x, (n - s) % n, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    ok = (idx < n - s) if s > 0 else (idx >= -s)
    return jnp.where(ok, rolled, jnp.full_like(x, _NEG))


def _slide_max_axis(x, radius, axis):
    """Centered sliding max over a window of 2*radius+1, O(log) shifts.

    Maintains g_span[i] = max(x[i : i+span]) for power-of-two spans and
    composes the window's binary decomposition.
    """
    k = radius + 1

    def build(sign):
        # sign=+1: f[i] = max(x[i : i+k]); sign=-1: f[i] = max(x[i-k+1 : i+1])
        # — each direction's -inf fills land exactly where the reference's
        # SAME window is clipped, so boundaries come out right
        powers = {1: x}
        span = 1
        while span * 2 <= k:
            powers[span * 2] = jnp.maximum(
                powers[span], _shift(powers[span], sign * span, axis)
            )
            span *= 2
        f = None
        covered = 0
        for bit in sorted(powers, reverse=True):
            if covered + bit <= k:
                part = powers[bit]
                f = part if f is None else jnp.maximum(
                    f, _shift(part, sign * covered, axis)
                )
                covered += bit
            if covered == k:
                break
        return f

    return jnp.maximum(build(1), build(-1))


def _slide_max(x, radius):
    return _slide_max_axis(
        _slide_max_axis(x, radius, x.ndim - 1), radius, x.ndim - 2
    )


def _nms_kernel(s_hbm, o_ref, tile, sem, *, radius, num_iters, halo, th):
    b = pl.program_id(0)
    t = pl.program_id(1)
    cp = pltpu.make_async_copy(
        s_hbm.at[b, pl.ds(t * th, th + 2 * halo), :], tile, sem
    )
    cp.start()
    cp.wait()

    s = tile[:, :].astype(jnp.float32)  # [th + 2*halo, W]
    zeros = jnp.zeros_like(s)
    max_mask = s == _slide_max(s, radius)
    for _ in range(num_iters):
        supp_mask = _slide_max(jnp.where(max_mask, 1.0, 0.0), radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, s)
        new_max = supp_scores == _slide_max(supp_scores, radius)
        max_mask = max_mask | (new_max & (~supp_mask))
    out = jnp.where(max_mask, s, zeros)
    o_ref[0] = out[halo : halo + th].astype(o_ref.dtype)


def simple_nms_pallas(
    scores: jax.Array, nms_radius: int, num_iters: int = 2,
    *, interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ops.nms.simple_nms on TPU.

    Args:
      scores: ``[B, H, W]`` non-negative score maps, H a multiple of 8.
    """
    b, h, w = scores.shape
    radius = nms_radius
    if radius <= 0:
        return scores
    # chain depth: 1 detect + 2 per recovery iteration; halo 8-aligned for
    # the sliced fetch
    depth = 1 + 2 * num_iters
    halo = -(-depth * radius // 8) * 8
    th = 32 if h % 32 == 0 else 8
    assert h % th == 0, f"H={h} must be a multiple of {th}"

    wpad = -(-w // 128) * 128
    spad = jnp.pad(scores, ((0, 0), (halo, halo), (0, wpad - w)))
    grid = (b, h // th)
    out = pl.pallas_call(
        partial(_nms_kernel, radius=radius, num_iters=num_iters, halo=halo,
                th=th),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, th, wpad), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wpad), scores.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * halo, wpad), scores.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(spad)
    return out[:, :, :w] if wpad != w else out
